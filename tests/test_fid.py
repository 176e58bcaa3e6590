"""In-repo FID: closed-form Frechet checks, streaming moments, InceptionV3
converter parity against a torch-mini built to the torchvision/pytorch-fid
architecture, and the compute-fid CLI."""

import json

import jax
import numpy as np
import pytest

from reed_tpu.eval.frechet import (
    StreamingMoments,
    compute_activation_stats,
    frechet_distance,
)


def test_frechet_closed_form_identical():
    mu = np.array([1.0, -2.0, 0.5])
    a = np.random.default_rng(0).standard_normal((3, 3))
    sigma = a @ a.T + np.eye(3)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_closed_form_diagonal():
    """For diagonal gaussians FID = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    mu1, mu2 = np.array([0.0, 0.0]), np.array([3.0, -1.0])
    s1 = np.diag([4.0, 9.0])
    s2 = np.diag([1.0, 16.0])
    expected = np.sum((mu1 - mu2) ** 2) + (2 - 1) ** 2 + (3 - 4) ** 2
    assert abs(frechet_distance(mu1, s1, mu2, s2) - expected) < 1e-8


def test_streaming_moments_match_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 7))
    m = StreamingMoments(7)
    for i in range(0, 500, 64):
        m.update(x[i:i + 64])
    assert m.n == 500
    np.testing.assert_allclose(m.mean, x.mean(axis=0), atol=1e-12)
    np.testing.assert_allclose(m.cov, np.cov(x, rowvar=False), atol=1e-10)


def test_sampled_gaussians_fid_close_to_analytic():
    rng = np.random.default_rng(2)
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 1.5)
    s1, s2 = np.eye(d), np.eye(d) * 2.0
    x1 = rng.standard_normal((20000, d)) @ np.linalg.cholesky(s1).T + mu1
    x2 = rng.standard_normal((20000, d)) @ np.linalg.cholesky(s2).T + mu2
    analytic = frechet_distance(mu1, s1, mu2, s2)
    est = frechet_distance(x1.mean(0), np.cov(x1, rowvar=False),
                           x2.mean(0), np.cov(x2, rowvar=False))
    assert abs(est - analytic) / analytic < 0.05


# ---- InceptionV3 parity ---------------------------------------------------

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


class TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg3(x))], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(_avg3(x))], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool_kind):
        super().__init__()
        self.pool_kind = pool_kind
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        pooled = _avg3(x) if self.pool_kind == "avg" else \
            F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(pooled)], 1)


class TInceptionPool3(tnn.Module):
    """torchvision inception_v3 trunk with the pytorch-fid pool patches."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)


@pytest.mark.slow
def test_inception_convert_parity():
    from reed_tpu.encoders.inception import (
        InceptionV3Pool3,
        convert_torch_inception,
    )

    torch.manual_seed(0)
    tmodel = TInceptionPool3().eval()
    # non-trivial BN running stats
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.8, 1.2)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    variables = convert_torch_inception(tmodel.state_dict())
    import jax.numpy as jnp

    feats = InceptionV3Pool3().apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    diff = np.max(np.abs(np.asarray(feats) - tfeats))
    assert diff < 5e-3, diff


def test_compute_fid_cli(tmp_path, capsys):
    """compute-fid on two stats npz files matches frechet_distance."""
    from reed_tpu.cli import main

    rng = np.random.default_rng(3)
    d = 5
    a_x = rng.standard_normal((400, d))
    b_x = rng.standard_normal((400, d)) * 1.5 + 1.0
    for name, x in (("a", a_x), ("b", b_x)):
        np.savez(tmp_path / f"{name}.npz", mu=x.mean(0),
                 sigma=np.cov(x, rowvar=False))
    main(["compute-fid", str(tmp_path / "a.npz"), str(tmp_path / "b.npz")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    expected = frechet_distance(a_x.mean(0), np.cov(a_x, rowvar=False),
                                b_x.mean(0), np.cov(b_x, rowvar=False))
    assert abs(out["fid"] - expected) < 1e-6


def test_activation_stats_pipeline(tmp_path):
    """images -> feature_fn -> streaming stats -> FID ~ 0 for identical
    sets (tiny random feature extractor)."""
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (64, 8, 8, 3), dtype=np.uint8)
    w = rng.standard_normal((192, 6)).astype(np.float32)

    def feature_fn(batch):
        return batch.reshape(batch.shape[0], -1).astype(np.float32) @ w

    s1 = compute_activation_stats(imgs, feature_fn, batch_size=16)
    s2 = compute_activation_stats(imgs.copy(), feature_fn, batch_size=9)
    assert abs(frechet_distance(s1["mu"], s1["sigma"],
                                s2["mu"], s2["sigma"])) < 1e-6
