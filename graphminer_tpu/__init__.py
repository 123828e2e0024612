"""graphminer_tpu — a TPU-native graph pattern mining framework.

A from-scratch JAX/XLA/Pallas redesign with the capability set of
chenxuhao/GraphMiner (G²Miner/Pangolin/Sandslash): triangle counting,
k-clique listing, subgraph listing, k-motif counting, frequent subgraph
mining — exact counts, scaled over TPU meshes with shard_map + psum.
"""
import jax as _jax

# Exact pattern counts routinely exceed 2^31 (e.g. 5-cliques on LiveJournal =
# 467,429,836,174). All device-side math is explicit int32; x64 is enabled so
# the *final* chunk-sum reductions can run in (emulated-on-TPU) int64, which
# mirrors the reference's AccType=uint64 accumulators (include/common.h:40).
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the framework deliberately compiles a small
# family of fixed-shape kernels (degree-class × chunk variants); caching them
# across processes matters because TPU compile latency dominates small runs.
import os as _os
_cache_dir = _os.environ.get("GRAPHMINER_JAX_CACHE",
                             _os.path.expanduser("~/.cache/graphminer_jax"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .core.graph import HostGraph  # noqa: E402,F401
from .core.device_graph import DeviceGraph  # noqa: E402,F401
from .io.loader import load_graph, save_graph  # noqa: E402,F401

__version__ = "0.1.0"
