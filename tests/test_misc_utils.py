import numpy as np

from vulkanhybridrenderer_tpu.utils.bluenoise import blue_noise_rgba, void_and_cluster
from vulkanhybridrenderer_tpu.utils.image import linear_to_srgb, rmse, to_uint8_image


def test_void_and_cluster_uniform_histogram():
    bn = void_and_cluster(16, seed=1)
    assert bn.shape == (16, 16)
    # rank-ordered: every threshold appears exactly once
    assert len(np.unique(bn)) == 256
    assert 0.0 < bn.min() < 0.01 and 0.99 < bn.max() < 1.0


def test_blue_noise_spectrum_is_blue():
    bn = void_and_cluster(32, seed=0) - 0.5
    f = np.abs(np.fft.fftshift(np.fft.fft2(bn)))
    c = 16
    # low-frequency ring energy should be well below high-frequency ring energy
    yy, xx = np.meshgrid(np.arange(32) - c, np.arange(32) - c, indexing="ij")
    r = np.sqrt(yy**2 + xx**2)
    low = f[(r > 0) & (r < 4)].mean()
    high = f[(r > 10) & (r < 14)].mean()
    assert high > 1.5 * low


def test_blue_noise_rgba_channels_differ():
    t = blue_noise_rgba(16, seed=0)
    assert t.shape == (16, 16, 4)
    assert not np.allclose(t[..., 0], t[..., 1])


def test_srgb_encode_and_uint8():
    img = np.zeros((3, 4, 4), np.float32)
    img[0] = 0.5
    out = to_uint8_image(img)
    assert out.shape == (4, 4, 3)
    assert abs(int(out[0, 0, 0]) - 188) <= 1  # sRGB(0.5) ~ 0.7354 -> 188
    assert out[0, 0, 1] == 0


def test_rmse():
    a = np.zeros((2, 2))
    b = np.ones((2, 2)) * 0.1
    assert abs(rmse(a, b) - 0.1) < 1e-7
