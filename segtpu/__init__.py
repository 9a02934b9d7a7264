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
        if getattr(jax.config, "jax_platforms", None) == "cpu":
            # CPU-forced runs (tests, multichip dryrun): the XLA:CPU
            # persistent cache is UNSAFE on this stack — deserializing
            # AOT entries intermittently segfaults even same-host/
            # same-run (observed twice: SIGSEGV inside
            # compilation_cache.get_executable_and_time, preceded by
            # cpu_aot_loader "machine feature +prefer-no-scatter not
            # supported" warnings; a per-host-fingerprint cache dir did
            # not fix it). Leave the persistent cache OFF for CPU; the
            # in-process jit cache still amortizes within a run, and TPU
            # executables (which ARE stable) keep the shared dir below.
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
