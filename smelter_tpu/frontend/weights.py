"""Real-checkpoint loading: torchvision-style state dicts into zoo models.

The BASELINE accuracy gate (top-1 Δ ≤ 0.1% vs FP32, BASELINE.md:9)
ultimately runs on PRETRAINED weights. No checkpoints ship in this
environment, but the harness must be ready the moment one is obtainable
(VERDICT r4 missing #1): this module loads a torchvision-style
checkpoint — ``.npz`` (name → array) or torch ``.pt``/``.pth`` — into a
zoo torch module, and re-exports the graph so the real weights flow
through quantization and the accuracy gate.

Reference scope: none (the reference loads weights only from the ONNX
file itself, Sources/Smelter/ONNXGraph.swift:106-108); this is harness
infrastructure for the driver's accuracy gate.
"""

from __future__ import annotations


def load_checkpoint(path):
    """Read a checkpoint file into a {name: torch.Tensor} dict.

    Accepts ``.npz`` archives (numpy arrays keyed by state-dict name)
    and torch ``.pt``/``.pth`` files (a plain state dict, or the common
    ``{"state_dict": ...}``/``{"model": ...}`` nestings). ``module.``
    DataParallel prefixes are stripped."""
    import numpy as np
    import torch

    if str(path).endswith(".npz"):
        sd = {k: torch.from_numpy(np.asarray(v))
              for k, v in np.load(path).items()}
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd \
                    and isinstance(sd[key], dict):
                sd = sd[key]
        sd = {k: v for k, v in sd.items() if hasattr(v, "shape")}
    return {k.removeprefix("module."): v for k, v in sd.items()}


def load_weights(module, path, *, strict: bool = False):
    """Load `path` into torch `module` in place. Returns
    (missing_keys, unexpected_keys) from load_state_dict; with
    strict=False (default), BN ``num_batches_tracked`` and other
    bookkeeping mismatches are tolerated but real weight-shape
    mismatches still raise."""
    sd = load_checkpoint(path)
    res = module.load_state_dict(sd, strict=strict)
    module.eval()
    return res.missing_keys, res.unexpected_keys


def reexport_with_weights(zoo_build, path, *, batch: int = 32, **kw):
    """Build a zoo model, load the checkpoint into its torch module, and
    re-export the graph so the initializers ARE the real weights.
    Returns (graph, torch_module, input_shape)."""
    import torch

    from .torch_export import export_torch

    g0, tm, shape = zoo_build(batch=batch, **kw)
    missing, unexpected = load_weights(tm, path)
    if missing:
        import warnings

        warnings.warn(f"checkpoint is missing {len(missing)} keys "
                      f"(first: {missing[:3]})", stacklevel=2)
    example = torch.randn(*shape)
    g = export_torch(tm, (example,), name=g0.name)
    return g, tm, shape
