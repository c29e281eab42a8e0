"""LPIPS torch->flax conversion parity.

Builds a state dict in the exact key layout of the ``lpips`` package's
LPIPS(net='vgg') checkpoint (torchvision ``features.N.{weight,bias}``
convs + ``lin{i}.model.1.weight`` heads), runs the reference forward
algebra in torch (Zhang et al. 2018: scaling layer, VGG16 trunk,
unit-normalize with eps outside the sqrt, squared diff, non-negative
1x1 heads, spatial average — lpips/lpips.py), and asserts the flax
module with converted weights matches.  Guards the key-mapping code
that every reported LPIPS number rests on
(reference loss path: lensless/recon/utils.py:741-758).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lenslesspicam_tpu.eval import lpips as jlpips


def _build_state_dict(rng):
    """Random weights in the lpips-checkpoint key layout."""
    sd = {}
    idx = 0
    in_ch = 3
    for stage_idx, (ch, n_convs) in enumerate(jlpips._VGG_STAGES):
        for _ in range(n_convs):
            w = rng.randn(ch, in_ch, 3, 3).astype(np.float32) * 0.1
            b = rng.randn(ch).astype(np.float32) * 0.1
            sd[f"features.{idx}.weight"] = torch.tensor(w)
            sd[f"features.{idx}.bias"] = torch.tensor(b)
            in_ch = ch
            idx += 2  # conv + relu
        idx += 1  # maxpool
    for i, (ch, _) in enumerate(jlpips._VGG_STAGES):
        # pretrained lpips lin heads are non-negative; keep the random
        # ones non-negative too so torch (w) and flax (|w|) agree
        w = np.abs(rng.randn(1, ch, 1, 1).astype(np.float32)) * 0.05
        sd[f"lin{i}.model.1.weight"] = torch.tensor(w)
    return sd


def _torch_lpips_forward(sd, pred_nchw, tgt_nchw):
    """The lpips package forward, verbatim algebra (normalize=True)."""
    import torch.nn.functional as F

    shift = torch.tensor(jlpips._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(jlpips._SCALE).view(1, 3, 1, 1)

    def prep(x):
        return (2.0 * x - 1.0 - shift) / scale

    def vgg_feats(x):
        feats = []
        idx = 0
        for stage_idx, (_, n_convs) in enumerate(jlpips._VGG_STAGES):
            for _ in range(n_convs):
                x = F.conv2d(x, sd[f"features.{idx}.weight"],
                             sd[f"features.{idx}.bias"], padding=1)
                x = F.relu(x)
                idx += 2
            feats.append(x)
            if stage_idx < len(jlpips._VGG_STAGES) - 1:
                x = F.max_pool2d(x, 2, 2)
                idx += 1
        return feats

    fa = vgg_feats(prep(pred_nchw))
    fb = vgg_feats(prep(tgt_nchw))
    val = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb) ** 2
        w = sd[f"lin{i}.model.1.weight"]
        val = val + (diff * w).sum(1).mean(dim=(1, 2))
    return val


def test_lpips_conversion_forward_parity(tmp_path):
    rng = np.random.RandomState(0)
    sd = _build_state_dict(rng)
    ckpt = tmp_path / "lpips_vgg.pth"
    torch.save(sd, ckpt)

    pred = rng.rand(2, 64, 64, 3).astype(np.float32)
    tgt = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips_forward(
            sd, torch.tensor(pred.transpose(0, 3, 1, 2)),
            torch.tensor(tgt.transpose(0, 3, 1, 2))).numpy()

    variables = jlpips.load_torch_lpips(str(ckpt))
    out = np.asarray(jlpips.LPIPS().apply(variables, pred, tgt))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def _build_alex_state_dict(rng):
    """Random weights in the lpips(net='alex') checkpoint key layout
    (torchvision AlexNet features indices 0,3,6,8,10)."""
    sd = {}
    in_ch = 3
    for feat_idx, (ch, k, _s, _p) in zip(jlpips._ALEX_FEAT_IDX,
                                         jlpips._ALEX_CONVS):
        w = rng.randn(ch, in_ch, k, k).astype(np.float32) * 0.05
        b = rng.randn(ch).astype(np.float32) * 0.05
        sd[f"features.{feat_idx}.weight"] = torch.tensor(w)
        sd[f"features.{feat_idx}.bias"] = torch.tensor(b)
        in_ch = ch
    for i, (ch, _k, _s, _p) in enumerate(jlpips._ALEX_CONVS):
        w = np.abs(rng.randn(1, ch, 1, 1).astype(np.float32)) * 0.05
        sd[f"lin{i}.model.1.weight"] = torch.tensor(w)
    return sd


def _torch_lpips_alex_forward(sd, pred_nchw, tgt_nchw):
    """The lpips package alex forward, verbatim algebra (normalize=True)."""
    import torch.nn.functional as F

    shift = torch.tensor(jlpips._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(jlpips._SCALE).view(1, 3, 1, 1)

    def prep(x):
        return (2.0 * x - 1.0 - shift) / scale

    def alex_feats(x):
        feats = []
        for i, (feat_idx, (_ch, _k, s, p)) in enumerate(
                zip(jlpips._ALEX_FEAT_IDX, jlpips._ALEX_CONVS)):
            x = F.conv2d(x, sd[f"features.{feat_idx}.weight"],
                         sd[f"features.{feat_idx}.bias"], stride=s, padding=p)
            x = F.relu(x)
            feats.append(x)
            if i < 2:
                x = F.max_pool2d(x, 3, 2)
        return feats

    fa = alex_feats(prep(pred_nchw))
    fb = alex_feats(prep(tgt_nchw))
    val = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        na = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb) ** 2
        w = sd[f"lin{i}.model.1.weight"]
        val = val + (diff * w).sum(1).mean(dim=(1, 2))
    return val


def test_lpips_alex_conversion_forward_parity(tmp_path):
    """LPIPS-Alex — the backbone the Monakhova literature baselines use
    (reference scripts/eval/benchmark_recon.py:387-414,
    lensless/eval/benchmark.py:144-146)."""
    rng = np.random.RandomState(2)
    sd = _build_alex_state_dict(rng)
    ckpt = tmp_path / "lpips_alex.pth"
    torch.save(sd, ckpt)

    # 64px input: conv1 (s4) -> 15px, two pools -> 3px at the tail
    pred = rng.rand(2, 64, 64, 3).astype(np.float32)
    tgt = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips_alex_forward(
            sd, torch.tensor(pred.transpose(0, 3, 1, 2)),
            torch.tensor(tgt.transpose(0, 3, 1, 2))).numpy()

    variables = jlpips.load_torch_lpips(str(ckpt), net="alex")
    out = np.asarray(jlpips.LPIPS(net="alex").apply(variables, pred, tgt))

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_lpips_conversion_net_prefixed_keys(tmp_path):
    """The merged-checkpoint layout (net.features.N.*) converts too."""
    rng = np.random.RandomState(1)
    sd = _build_state_dict(rng)
    sd2 = {(f"net.{k}" if k.startswith("features.") else k): v
           for k, v in sd.items()}
    ckpt = tmp_path / "lpips_merged.pth"
    torch.save(sd2, ckpt)

    pred = rng.rand(1, 32, 32, 3).astype(np.float32)
    tgt = rng.rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips_forward(
            sd, torch.tensor(pred.transpose(0, 3, 1, 2)),
            torch.tensor(tgt.transpose(0, 3, 1, 2))).numpy()
    variables = jlpips.load_torch_lpips(str(ckpt))
    out = np.asarray(jlpips.LPIPS().apply(variables, pred, tgt))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_weights_fixture_path_end_to_end(tmp_path, monkeypatch):
    """VERDICT r4 #8: the LPT_LPIPS_WEIGHTS env hook drives benchmark()
    to emit LPIPS columns end-to-end from a weights FILE — here the
    deterministic CI stand-in (.npz); users with network point it at a
    converted ``lpips`` package checkpoint instead (one-command recipe
    in docs/source/evaluation.rst and eval/lpips.py)."""
    import os

    import jax
    import numpy as np

    from lenslesspicam_tpu.eval import lpips as L
    from lenslesspicam_tpu.eval.benchmark import benchmark
    from lenslesspicam_tpu.recon import admm

    vgg_path = L.make_standin_weights(str(tmp_path / "vgg.npz"), net="vgg")
    alex_path = L.make_standin_weights(str(tmp_path / "alex.npz"),
                                       net="alex")

    # npz round-trip is exact: same metric values as in-memory params
    rng = np.random.RandomState(0)
    a = rng.rand(2, 32, 32, 3).astype(np.float32)
    b = rng.rand(2, 32, 32, 3).astype(np.float32)
    model = L.LPIPS(net="vgg")
    direct = np.asarray(model.apply(
        L.random_params(jax.random.PRNGKey(0)), a, b))
    via_file = np.asarray(L.metric_from_weights(vgg_path, "vgg")(a, b))
    np.testing.assert_allclose(via_file, direct, rtol=1e-5)

    monkeypatch.setenv("LPT_LPIPS_WEIGHTS", vgg_path)
    monkeypatch.setenv("LPT_LPIPS_ALEX_WEIGHTS", alex_path)

    # AlexNet's stride-4 trunk needs >=64-px inputs (smaller maps
    # collapse to zero spatial size after its pools — same in torch)
    psf = rng.rand(1, 64, 64, 3).astype(np.float32)
    psf /= np.linalg.norm(psf)
    conv = admm.make_convolver(psf)
    batches = [{
        "lensless": rng.rand(2, 1, 64, 64, 3).astype(np.float32),
        "lensed": rng.rand(2, 1, 64, 64, 3).astype(np.float32),
    }]
    res = benchmark(lambda lensless: admm.run_jit(conv, lensless, n_iter=2),
                    batches)
    assert "LPIPS_Vgg" in res and "LPIPS_Alex" in res
    assert np.isfinite(res["LPIPS_Vgg"]) and np.isfinite(res["LPIPS_Alex"])
