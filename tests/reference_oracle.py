"""Import-and-run harness for the ACTUAL reference implementation on CPU.

The reference (/root/reference, haoyu94/RoITr) is CUDA-only: it links a
pybind11 `pointops_cuda` extension and sprinkles `.cuda()` calls through the
live path. This module makes it runnable on CPU *without modifying it*:

- pure-torch reimplementations of the pointops API with the exact CUDA
  kernel semantics (reference cpp_wrappers/pointops/functions/pointops.py,
  src/knnquery/knnquery_cuda_kernel.cu:65-108,
  src/sampling/sampling_cuda_kernel.cu:14-141), injected into sys.modules
  under the module path the reference imports;
- an `open3d` stub (only imported, never called, in the model path);
- `torch.Tensor.cuda`/`torch.cuda.*Tensor` monkeypatches (no-op on CPU).

This is deliberately NOT used by the framework itself — it exists so
tests/test_reference_parity.py can compare roitr_tpu against the real
reference network instead of hand-transcribed oracles (VERDICT round 1,
missing #1).
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

REF_ROOT = "/root/reference"

# ---------------------------------------------------------------------------
# pure-torch pointops (exact CUDA kernel semantics)
# ---------------------------------------------------------------------------


def _seg_bounds(offset):
    off = [int(x) for x in offset]
    starts = [0] + off[:-1]
    return list(zip(starts, off))


def knnquery(nsample, xyz, new_xyz, offset, new_offset):
    """knnquery_cuda_kernel.cu:65-108: per-segment kNN, ascending by
    squared distance, global indices; short segments pad with
    (dist2=1e10, idx=segment start). Returns (idx int32, sqrt(dist2))."""
    if new_xyz is None:
        new_xyz = xyz
    m = new_xyz.shape[0]
    idx = torch.zeros(m, nsample, dtype=torch.int32)
    d2 = torch.full((m, nsample), 1e10)
    for (ks, ke), (qs, qe) in zip(_seg_bounds(offset), _seg_bounds(new_offset)):
        seg = xyz[ks:ke]
        q = new_xyz[qs:qe]
        dist2 = ((q[:, None, :] - seg[None, :, :]) ** 2).sum(-1)
        k = min(nsample, seg.shape[0])
        vals, ids = torch.topk(dist2, k, dim=1, largest=False, sorted=True)
        idx[qs:qe, :k] = (ids + ks).int()
        d2[qs:qe, :k] = vals
        if k < nsample:
            idx[qs:qe, k:] = ks
    return idx, torch.sqrt(d2)


def furthestsampling(xyz, offset, new_offset):
    """sampling_cuda_kernel.cu:14-141: seed = segment start, running
    min-distance vector, argmax selection. Global int32 indices."""
    sel_all = []
    for (s, e), (ms, me) in zip(_seg_bounds(offset), _seg_bounds(new_offset)):
        pts = xyz[s:e]
        tmp = torch.full((e - s,), 1e10)
        last = 0
        sel = [s]
        for _ in range(me - ms - 1):
            d = ((pts - pts[last]) ** 2).sum(-1)
            tmp = torch.minimum(tmp, d)
            last = int(torch.argmax(tmp))
            sel.append(s + last)
        sel_all.extend(sel)
    return torch.tensor(sel_all, dtype=torch.int32)


def grouping(input, idx):
    """grouping_cuda_kernel.cu:5-40: gather (n,c)[idx (m,ns)] -> (m,ns,c)."""
    return input[idx.long()]


def queryandgroup(nsample, xyz, new_xyz, feat, idx, offset, new_offset,
                  return_idx=False, use_xyz=True):
    """pointops.py:79-104: kNN excluding self (k+1 then drop col 0) +
    center-subtracted gather."""
    if new_xyz is None:
        new_xyz = xyz
    if idx is None:
        idx, _ = knnquery(nsample + 1, xyz, new_xyz, offset, new_offset)
        idx = idx[:, 1:].contiguous().long()
    if return_idx:
        return idx
    m, c = new_xyz.shape[0], feat.shape[1]
    grouped_xyz = xyz[idx.view(-1).long(), :].view(m, nsample, 3)
    grouped_xyz = grouped_xyz - new_xyz.unsqueeze(1)
    grouped_feat = feat[idx.view(-1).long(), :].view(m, nsample, c)
    if use_xyz:
        return torch.cat((grouped_xyz, grouped_feat), -1)
    return grouped_feat


def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
    """pointops.py:168-182: 3-NN inverse-distance feature upsampling."""
    idx, dist = knnquery(k, xyz, new_xyz, offset, new_offset)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = torch.sum(dist_recip, dim=1, keepdim=True)
    weight = dist_recip / norm
    new_feat = torch.zeros(new_xyz.shape[0], feat.shape[1])
    for i in range(k):
        new_feat += feat[idx[:, i].long(), :] * weight[:, i].unsqueeze(-1)
    return new_feat


def subtraction(input1, input2, idx):  # dead in the live path
    return input1.unsqueeze(1) - input2[idx.long()]


def aggregation(input, position, weight, idx):  # dead in the live path
    raise NotImplementedError("aggregation is unused by the reference live path")


interpolation2 = interpolation  # autograd variant; forward semantics identical


# ---------------------------------------------------------------------------
# environment installation
# ---------------------------------------------------------------------------

_installed = False


def _fake_sized_tensor(dtype):
    def ctor(*args):
        if len(args) == 1 and not isinstance(args[0], int):
            return torch.as_tensor(args[0], dtype=dtype)
        return torch.zeros(*args, dtype=dtype)

    return ctor


def install_reference():
    """Make `import model.RIGA_v2` from /root/reference work on CPU.
    Idempotent. Returns the imported reference RIGA_v2 module."""
    global _installed
    if not _installed:
        # 1. open3d stub (imported at module top, unused in the model path)
        if "open3d" not in sys.modules:
            o3d = types.ModuleType("open3d")
            o3d.geometry = types.SimpleNamespace()
            o3d.utility = types.SimpleNamespace()
            o3d.pipelines = types.SimpleNamespace()
            sys.modules["open3d"] = o3d

        # 2. pure-torch pointops, registered at the reference's import path
        names = ["cpp_wrappers", "cpp_wrappers.pointops",
                 "cpp_wrappers.pointops.functions",
                 "cpp_wrappers.pointops.functions.pointops"]
        mods = {}
        for n in names:
            m = types.ModuleType(n)
            m.__path__ = []  # mark as package
            sys.modules[n] = m
            mods[n] = m
        po = mods[names[-1]]
        for fn in (knnquery, furthestsampling, grouping, queryandgroup,
                   interpolation, interpolation2, subtraction, aggregation):
            setattr(po, fn.__name__, fn)
        po.interpolation2 = interpolation2
        mods["cpp_wrappers"].pointops = mods["cpp_wrappers.pointops"]
        mods["cpp_wrappers.pointops"].functions = mods["cpp_wrappers.pointops.functions"]
        mods["cpp_wrappers.pointops.functions"].pointops = po

        # 3. neutralize CUDA calls
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
        torch.cuda.manual_seed_all = lambda *a, **k: None
        torch.cuda.IntTensor = _fake_sized_tensor(torch.int32)
        torch.cuda.LongTensor = _fake_sized_tensor(torch.int64)
        torch.cuda.FloatTensor = _fake_sized_tensor(torch.float32)
        torch.cuda.BoolTensor = _fake_sized_tensor(torch.bool)

        if REF_ROOT not in sys.path:
            sys.path.append(REF_ROOT)
        _installed = True

    import model.RIGA_v2 as riga  # noqa: reference package

    return riga


class RefConfig(types.SimpleNamespace):
    """Attribute bag standing in for the reference's EasyDict config."""


def make_ref_config(cfg):
    """Build the reference config namespace from a roitr_tpu Config."""
    return RefConfig(
        benchmark=cfg.benchmark,
        mode="test",
        with_cross_pos_embed=cfg.with_cross_pos_embed,
        transformer_architecture=list(cfg.transformer_architecture),
        num_est_coarse_corr=cfg.num_est_coarse_corr,
        num_gt_coarse_corr=cfg.num_gt_coarse_corr,
        point_per_patch=cfg.point_per_patch,
        matching_radius=cfg.matching_radius,
        coarse_overlap_threshold=cfg.coarse_overlap_threshold,
        fine_matching_topk=cfg.fine_matching_topk,
        fine_matching_mutual=cfg.fine_matching_mutual,
        fine_matching_confidence_threshold=cfg.fine_matching_confidence_threshold,
        fine_matching_use_dustbin=cfg.fine_matching_use_dustbin,
        fine_matching_use_global_score=cfg.fine_matching_use_global_score,
        fine_matching_correspondence_threshold=cfg.fine_matching_correspondence_threshold,
    )


def run_reference_training_step(cfg, arrays, src_normals, tgt_normals, seed=0,
                                weight_noise=0.0, coarse_override=None,
                                lr=0.01, weight_decay=0.0):
    """ONE reference training step (reference lib/trainer.py:169-267 +
    main.py:79-100): forward with gradients enabled, OverallLoss
    (lib/loss.py:8-143), loss.backward(), one Adam(betas=(0.9, 0.99)) step.

    The model stays in eval() mode: the reference configures no dropout
    (geotransformer.py:20 dropout=None -> Identity) and has no batch norm in
    the live path, so train()/eval() are numerically identical EXCEPT that
    train() swaps the coarse selection to the torch-RNG GTCoarseCorrGenerator
    — eval() keeps the deterministic CoarseMatching branch, which
    `coarse_override` replaces so both pipelines differentiate through
    IDENTICAL patches.

    Returns (state_dict_before, grads_by_name, state_dict_after, losses)."""
    riga = install_reference()
    from lib.loss import OverallLoss

    torch.manual_seed(seed)
    model = riga.create_model(make_ref_config(cfg)).eval()
    if weight_noise:
        g = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.randn(p.shape, generator=g) * weight_noise)

    if coarse_override is not None:
        t_idx = torch.from_numpy(np.asarray(coarse_override[0])).long()
        s_idx = torch.from_numpy(np.asarray(coarse_override[1])).long()
        ones = torch.ones(t_idx.shape[0])

        class _Stub(torch.nn.Module):
            def forward(self, *args, **kw):
                return t_idx, s_idx, ones

        model.coarse_matching = _Stub()

    sd_before = {k: v.detach().clone() for k, v in model.state_dict().items()}

    n = int(arrays["src_count"])
    m = int(arrays["tgt_count"])
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a).copy()).float()
    out = model(
        t(arrays["src_points"][:n]), t(arrays["tgt_points"][:m]),
        torch.ones(n, 1), torch.ones(m, 1),
        t(src_normals[:n]), t(tgt_normals[:m]),
        t(arrays["rot"]), t(arrays["trans"]),
        t(arrays["src_raw_points"][:n]),
    )
    data_dict = {"rot": t(arrays["rot"])[None], "trans": t(arrays["trans"])[None]}
    losses = OverallLoss(cfg)(out, data_dict)

    opt = torch.optim.Adam(
        model.parameters(), lr=lr, betas=(0.9, 0.99), weight_decay=weight_decay
    )
    opt.zero_grad()
    losses["loss"].backward()
    grads = {
        k: (p.grad.detach().clone() if p.grad is not None else torch.zeros_like(p))
        for k, p in model.named_parameters()
    }
    opt.step()
    sd_after = {k: v.detach().clone() for k, v in model.state_dict().items()}
    return sd_before, grads, sd_after, {k: float(v) for k, v in losses.items()}


def run_reference_forward(cfg, arrays, src_normals, tgt_normals, seed=0,
                          weight_noise=0.0, coarse_override=None):
    """Instantiate the real reference RIGA_v2 (random init, seeded), run one
    eval-mode forward on the given pair, and return (state_dict, outputs as
    numpy). `arrays` is make_pair_arrays output; normals are numpy (n,3).

    `weight_noise` adds seeded gaussian noise to every parameter (descriptor
    diversity knob; an untrained net's node descriptors are nearly identical
    so downstream top-k selections are knife-edge ties).

    `coarse_override=(tgt_idx, src_idx)` (numpy int arrays) replaces the
    coarse-matching output so both pipelines run OT + fine matching on
    IDENTICAL patches; the model's natural selection is still computed and
    returned under key 'natural_coarse' = (tgt_idx, src_idx)."""
    riga = install_reference()
    torch.manual_seed(seed)
    model = riga.create_model(make_ref_config(cfg)).eval()
    if weight_noise:
        g = torch.Generator().manual_seed(seed + 1)
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.randn(p.shape, generator=g) * weight_noise)

    captured = {}
    if coarse_override is not None:
        orig = model.coarse_matching
        t_idx = torch.from_numpy(np.asarray(coarse_override[0])).long()
        s_idx = torch.from_numpy(np.asarray(coarse_override[1])).long()
        ones = torch.ones(t_idx.shape[0])

        class _Stub(torch.nn.Module):
            def forward(self, *args, **kw):
                captured["natural_coarse"] = tuple(
                    x.detach().numpy() for x in orig(*args, **kw)[:2]
                )
                return t_idx, s_idx, ones

        model.coarse_matching = _Stub()

    n = int(arrays["src_count"])
    m = int(arrays["tgt_count"])
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a).copy()).float()
    src = t(arrays["src_points"][:n])
    src_raw = t(arrays["src_raw_points"][:n])
    tgt = t(arrays["tgt_points"][:m])
    with torch.no_grad():
        out = model(
            src, tgt,
            torch.ones(n, 1), torch.ones(m, 1),
            t(src_normals[:n]), t(tgt_normals[:m]),
            t(arrays["rot"]), t(arrays["trans"]),
            src_raw,
        )
    out_np = {k: (v.numpy() if isinstance(v, torch.Tensor) else v) for k, v in out.items()}
    out_np.update(captured)
    return model.state_dict(), out_np
