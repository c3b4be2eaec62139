"""deqmpc_tpu — a TPU-native (JAX/XLA/Pallas/pjit) DEQ-MPC framework.

A ground-up re-design of the capabilities of the reference DEQ-MPC
research codebase (`anonymous-author-918/deq-mpc-corl`): a deep-equilibrium network
proposes reference trajectories, a batched differentiable
augmented-Lagrangian trajectory optimizer projects them onto the
dynamics manifold, and the network<->optimizer loop is trained
end-to-end with per-iteration imitation losses.

Design principles (TPU-first, not a port):
  * the entire DEQ-MPC iteration (network cell, Anderson acceleration,
    merit/residual assembly, Newton-KKT solves, line search, dual
    updates) is one jitted XLA program with static shapes,
    `lax.scan`/`fori_loop` control flow and `where`-masked early exit;
  * the Newton system is solved block-tridiagonally (O(T) Riccati-style
    factorization) instead of via dense Cholesky — implemented both as
    an XLA `lax.scan` and as a Pallas TPU kernel with the batch in
    vector lanes;
  * dynamics are pure jnp functions differentiated with `jacfwd`
    (replacing the reference's CasADi->C->CUDA pipeline);
  * parallelism is batch-axis sharding over a `jax.sharding.Mesh`
    (DP over ICI/DCN); per-sample solver state needs no collectives.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compile cache: the solver graphs (jacfwd-of-RK4 inside
# Newton while_loops) take 1-5 min to compile on the TPU toolchain;
# caching makes every later invocation start in seconds. Opt out with
# DEQMPC_NO_COMPILE_CACHE=1.
if not _os.environ.get("DEQMPC_NO_COMPILE_CACHE"):
    # key the cache by host CPU features: XLA:CPU AOT entries written
    # on a different host SIGILL when the instruction set shrank
    # (observed after a VM migration); TPU entries are unaffected but
    # share the dir
    import hashlib as _hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next((l for l in _f if l.startswith("flags")), "")
    except OSError:
        _flags = ""
    _cpu_key = _hashlib.sha1(_flags.encode()).hexdigest()[:12]
    _cache_dir = _os.environ.get(
        "DEQMPC_COMPILE_CACHE",
        _os.path.expanduser(f"~/.cache/deqmpc_jax_{_cpu_key}"),
    )
    try:
        # Respect a cache dir that was configured before this import
        # (tests/conftest.py points test processes at a test-local dir;
        # overriding it here made CPU test runs share the TPU trainer's
        # cache and crash deserializing foreign entries).
        if getattr(_jax.config, "jax_compilation_cache_dir", None) is None:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except Exception:  # older jax without these flags
        pass

    # jax's LRUCache.put writes cache entries with a bare
    # `write_bytes` (lru_cache.py:151) — no temp-file + rename. A
    # concurrent process (trainer on TPU + test run on CPU share this
    # dir) can read a half-written entry and segfault inside zstd
    # decompression (observed: two pytest crashes in
    # compilation_cache.get_executable_and_time). Make the write
    # atomic: same-directory temp file + os.replace.
    try:
        from jax._src import lru_cache as _lru

        if not getattr(_lru.LRUCache, "_deqmpc_atomic_put", False):
            _orig_put = _lru.LRUCache.put

            def _atomic_put(self, key, val):
                import tempfile as _tempfile

                if getattr(self, "eviction_enabled", False):
                    # Eviction needs the lock/size/atime bookkeeping of
                    # the original implementation; don't reimplement it.
                    return _orig_put(self, key, val)
                if not key:
                    raise ValueError("key cannot be empty")
                cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
                if cache_path.exists():
                    return
                fd, tmp = _tempfile.mkstemp(
                    dir=str(self.path), suffix=".tmp"
                )
                replaced = False
                try:
                    with _os.fdopen(fd, "wb") as f:
                        f.write(val)
                    _os.replace(tmp, str(cache_path))
                    replaced = True
                except OSError as e:
                    import logging as _logging

                    _logging.getLogger(__name__).debug(
                        "compile-cache write failed for %s: %s", key, e
                    )
                finally:
                    if not replaced:
                        try:
                            _os.unlink(tmp)
                        except OSError:
                            pass

            _atomic_put._deqmpc_orig = _orig_put
            _lru.LRUCache.put = _atomic_put
            _lru.LRUCache._deqmpc_atomic_put = True
    except Exception:  # pragma: no cover - jax internals moved
        pass
