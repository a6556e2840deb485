"""Image preprocessing golden test against PIL.

``torchvision.transforms.Resize((256, 256))`` on a PIL image (the
reference chain, impl/dataset.py:35-40) delegates to
``PIL.Image.resize(..., BILINEAR)``, which antialiases on downscale.
PIL is installed here (torchvision is not), so PIL *is* the oracle for
the op torchvision applies. PIL quantizes its output to uint8, so the
tightest achievable agreement is one quantization level: 1/255 in
[0, 1], i.e. 2/255 after normalize(0.5, 0.5).
"""

import numpy as np
import pytest

from multimodal_umap_tpu.data.flickr30k import preprocess_image

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

# One uint8 quantization level on the normalized [-1, 1] scale, plus
# float slack.
_TOL = 2.0 / 255.0 + 1e-4


def _synthetic_u8(shape, seed):
    """Smooth synthetic image (piecewise-bilinear upsample of noise)."""
    rng = np.random.default_rng(seed)
    small = rng.normal(size=(24, 18, 3))
    import jax.image

    big = np.asarray(jax.image.resize(small, (*shape, 3), "cubic"))
    lo, hi = big.min(), big.max()
    return np.clip((big - lo) / (hi - lo) * 255.0, 0, 255).astype(np.uint8)


def _pil_reference(u8):
    """torchvision chain via PIL: Resize((256,256), BILINEAR) ->
    CenterCrop(256) [identity] -> ToTensor -> Normalize(0.5, 0.5)."""
    pil = Image.fromarray(u8)
    out = np.asarray(
        pil.resize((256, 256), Image.BILINEAR), dtype=np.float32
    ) / 255.0
    return (out - 0.5) / 0.5


@pytest.mark.parametrize(
    "shape", [(500, 375), (333, 517), (1024, 768), (256, 256)]
)
def test_preprocess_matches_pil_downscale(shape):
    u8 = _synthetic_u8(shape, seed=hash(shape) % 2**31)
    ours = preprocess_image(u8)
    ref = _pil_reference(u8)
    assert ours.shape == (256, 256, 3)
    max_diff = float(np.abs(ours - ref).max())
    assert max_diff <= _TOL, (shape, max_diff)


def test_preprocess_matches_pil_upscale():
    """Upscale (<256px input): filter support stays 1 in both."""
    u8 = _synthetic_u8((128, 200), seed=7)
    ours = preprocess_image(u8)
    ref = _pil_reference(u8)
    max_diff = float(np.abs(ours - ref).max())
    assert max_diff <= _TOL, max_diff


def test_preprocess_range_and_dtype():
    u8 = _synthetic_u8((300, 300), seed=3)
    out = preprocess_image(u8)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
