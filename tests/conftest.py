"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-pod stand-in story (SURVEY.md §4 implication (c)): tests run on
CPU with ``xla_force_host_platform_device_count=8`` so sharding /
collective code paths execute without TPU hardware, and with x64 enabled
so fp64 conformance-vs-reference checks are exact.

NOTE: the environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU);
``jax.config.update('jax_platforms', 'cpu')`` must run before any backend
initialization, hence this happens at conftest import time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles ~100 XLA programs
# (ResNet train steps, shard_map losses, interpreted Pallas) — cached,
# repeat runs drop from ~12 min to ~3 min.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"
SCANNER = os.path.join(REFERENCE, "data", "scanner")
EXAMPLES = os.path.join(REFERENCE, "data", "example_imgs")


@pytest.fixture(scope="session")
def example_labels():
    """(filenames, (N,12) fp64 torch-normalized params) from the shipped
    example labels."""
    from sqtpu.data.labels import parse_labels_txt

    return parse_labels_txt(os.path.join(EXAMPLES, "labels.txt"))


@pytest.fixture(scope="session")
def golden_params(example_labels):
    """Params of 000000.bmp — the conformance anchor (SURVEY.md §6.2)."""
    _, labels = example_labels
    return np.asarray(labels[0], dtype=np.float64)


@pytest.fixture(scope="session")
def golden_image():
    """000000.bmp as float64 /255 (the torch pipeline normalization)."""
    from sqtpu.data.bmp import read_bmp

    img = read_bmp(os.path.join(EXAMPLES, "000000.bmp"))
    return img.astype(np.float64) / 255.0


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "scanner: tests that execute the reference scanner binary"
    )


def pytest_sessionfinish(session, exitstatus):
    """Arm a teardown watchdog: something in this environment's tunneled-
    TPU backend hangs the process after the last test (observed: inside a
    later sessionfinish hook, BEFORE the terminal summary prints — and
    again at interpreter shutdown). If teardown takes >60 s, force-exit
    with the session's real status, printing the pass/fail counts the
    swallowed summary would have shown."""
    import sys
    import threading

    try:
        tr = session.config.pluginmanager.get_plugin("terminalreporter")
        stats = {k: len(v) for k, v in tr.stats.items() if k}
    except Exception:
        stats = {}

    def _force_exit():
        sys.stderr.write("\n[conftest] teardown hung >60s — forcing exit "
                         f"(exitstatus={int(exitstatus)}, results "
                         f"{stats or 'unavailable'})\n")
        # os._exit skips buffer flushing — do it ourselves or the
        # terminal summary is lost when stdout is redirected to a file
        try:
            sys.stdout.flush()
        except Exception:
            pass
        sys.stderr.flush()
        os._exit(int(exitstatus))

    watchdog = threading.Timer(60.0, _force_exit)
    watchdog.daemon = True
    watchdog.start()
