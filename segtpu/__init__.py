"""segtpu — TPU-native cell-segmentation framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of the reference project
``SwagMag1213/image-segmentation-project`` (binary semantic segmentation of
grayscale cell-microscopy images) designed TPU-first:

- ``segtpu.data``    — TIFF pairing/discovery, fused on-device preprocessing
  (area resize + percentile clip + CLAHE + min-max normalize), on-device
  augmentation (4-transform production pipeline + 18 forward-selection
  candidates), device-resident batch loader.
- ``segtpu.models``  — Flax U-Net with resnet34 / resnet50 / densenet121
  encoders, additive attention gates + SE channel attention
  (reference: advanced_models.py).
- ``segtpu.losses``  — 16 segmentation losses behind a string-keyed registry
  (reference: losses.py:345-403).
- ``segtpu.metrics`` — confusion-count metrics, post-processed IoU
  (reference: utils.py:58-151).
- ``segtpu.train``   — jit-compiled train/eval epochs (lax.scan over device
  batches), plateau LR schedule, early stopping, best-weights tracking
  (reference: train.py:17-364).
- ``segtpu.eval``    — CrossValidator / ModelComparator protocols
  (reference: cross_validation.py).
- ``segtpu.experiments`` — the four experiment drivers
  (reference: main.py:20-37).
- ``segtpu.infer``   — tiled sliding-window inference with overlap blending.
- ``segtpu.parallel``— device mesh + GSPMD data-parallel sharding helpers.
- ``segtpu.kernels`` — Pallas TPU kernels for the hot paths.
"""

__version__ = "0.1.0"


def _cpu_only_platforms(platforms) -> bool:
    """True iff the jax_platforms value forces CPU and nothing else.

    Only then may the import-time cache setup skip the backend probe:
    on the axon relay jax_platforms is "axon,cpu" while the backend is
    tpu, so any broader test (e.g. ``"tpu" not in list``) wrongly
    disables the persistent compile cache exactly where it matters."""
    plat_list = [p.strip() for p in str(platforms or "").split(",")
                 if p.strip()]
    return bool(plat_list) and all(p == "cpu" for p in plat_list)


def _enable_compile_cache():
    """Persistent XLA compilation cache (opt out: SEGTPU_NO_COMPILE_CACHE=1).

    U-Net epoch programs are expensive to compile (remote-compile tunnels,
    slow host CPUs); the cache makes repeat experiment runs start in
    seconds instead of minutes."""
    import os
    if os.environ.get("SEGTPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        # Gate on the ACTUAL backend, not just the config override: if the
        # TPU relay is down JAX silently falls back to CPU with
        # jax_platforms unset, and XLA:CPU AOT entries must never reach the
        # shared persistent cache — deserializing them intermittently
        # segfaults on this stack (observed twice: SIGSEGV inside
        # compilation_cache.get_executable_and_time, preceded by
        # cpu_aot_loader "machine feature +prefer-no-scatter not
        # supported" warnings; a per-host-fingerprint cache dir did not
        # fix it). default_backend() initializes the backend here — the
        # cost any first jax op pays anyway; callers that need a CPU
        # override (tests/conftest.py, __graft_entry__) set
        # jax.config.update("jax_platforms", "cpu") before importing
        # segtpu, so the init lands on the platform they chose. The
        # persistent cache stays ON only for TPU executables (which ARE
        # stable); the in-process jit cache still amortizes CPU runs.
        #
        # Fast path FIRST (backend-free): callers that forced CPU via
        # jax.config.update("jax_platforms", "cpu") must not trigger a
        # backend probe at import time — on this rig a TPU-targeted
        # default_backend() can hang for hours when the relay is down
        # (CLAUDE.md), and a forced-CPU import should never touch the
        # relay at all.
        platforms = getattr(jax.config, "jax_platforms", None) or \
            os.environ.get("JAX_PLATFORMS", "")
        if _cpu_only_platforms(platforms):
            return
        if jax.default_backend() != "tpu":
            return
        cache_dir = os.environ.get("SEGTPU_COMPILE_CACHE",
                                   "/root/.cache/segtpu_jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compile_cache()


def __getattr__(name):
    # Lazy heavy import: `segtpu.Segmenter` without paying the full import
    # chain at package-import time.
    if name == "Segmenter":
        from segtpu.api import Segmenter
        return Segmenter
    raise AttributeError(name)
