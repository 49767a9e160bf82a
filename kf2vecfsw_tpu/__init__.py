"""kf2vecfsw-tpu: TPU-native alignment-free phylogenetic placement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of kf2vecFSW
(k-mer frequency -> embedding -> placement distance matrices):

- in-repo canonical k-mer counting engine (replaces the Jellyfish binary)
  with an MXU-histogram Pallas kernel and multi-chip sharded counting,
- host tree toolkit (newick, patristic distance matrices, sum_branch
  clustering; replaces treeswift + TreeCluster),
- jitted, ICI-sharded training engines for the subtree classifier and the
  per-subtree distance-embedding models (dense, chunked-streaming and
  Fourier Sliced-Wasserstein variants),
- blocked batch inference producing APPLES-compatible placement inputs.

File formats (.kf, .subtrees, .di_mtrx, classes.out, embeddings/distortions
CSVs, apples_input matrices) are byte/tolerance compatible with the
reference so downstream tooling (APPLES, gappa) keeps working.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations (each subcommand is
    its own process; without this every run pays ~20-60 s of recompiles).
    A user-set JAX_COMPILATION_CACHE_DIR always wins."""
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.environ.get(
        "KF2VEC_NO_COMPILATION_CACHE"
    ):
        return
    # forced-CPU runs (tests, dryruns) skip the cache: XLA:CPU AOT artifacts
    # are machine-feature-pinned and can SIGILL if flags drift between runs
    for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        if os.environ.get(var, "").strip().lower() == "cpu":
            return
    try:
        import hashlib
        import platform

        import jax

        # scope the cache per machine fingerprint: home directories are often
        # shared across cluster hosts, and implicit-CPU fallback would load
        # another machine's feature-pinned XLA:CPU artifacts (SIGILL risk)
        try:
            flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
        except Exception:
            flags = platform.processor()
        fingerprint = hashlib.sha1(
            (platform.machine() + flags).encode()
        ).hexdigest()[:12]
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "kf2vecfsw_tpu", "xla", fingerprint
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compilation_cache()
