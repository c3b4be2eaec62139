"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, and enable x64 for correctness-mode checks.

Note: the TPU harness pre-imports jax via sitecustomize, so env vars
alone are too late — we switch the (lazily-initialized) platform via
jax.config before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: nested-autodiff dynamics are compile-heavy;
# cache makes repeated test runs fast. The cache dir is keyed by the
# host CPU's feature set: XLA:CPU AOT binaries reuse the instruction
# set they were compiled for, and loading a cache written on a
# different host SIGILLs mid-test (observed: segfault in an estpred
# grad test after a VM migration changed the avx512 feature set).
import hashlib

try:
    with open("/proc/cpuinfo") as f:
        _flags = next((l for l in f if l.startswith("flags")), "")
except OSError:
    _flags = ""
_cpu_key = hashlib.sha1(_flags.encode()).hexdigest()[:12]
_cache_dir = f"/tmp/jax_test_cache_{_cpu_key}"
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# The suite compiles hundreds of XLA:CPU executables; each keeps
# multiple mmap regions alive, and a full single-process run crosses
# vm.max_map_count (65530 default) near test ~55, after which failed
# mmaps segfault the AOT loader inside compile/cache-read (measured:
# 53k maps by test 31; 5/5 full-suite crashes at the same mark in
# rounds 2-3). Dropping compiled executables between modules bounds the
# high-water mark; the persistent compile cache makes the re-loads
# cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_process_map_count():
    yield
    jax.clear_caches()
