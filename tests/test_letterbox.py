"""Letterbox inference mode: coordinates must map back to the original
image frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from improved_body_parts_tpu.configs import CanonicalConfig, InferenceConfig, ModelConfig
from improved_body_parts_tpu.infer.predict import Predictor
from improved_body_parts_tpu.models.imhn import create_model, init_model
import dataclasses


def test_letterbox_geometry():
    config = CanonicalConfig(
        width=128, height=128,
        model=ModelConfig(nstack=2, inp_dim=32, increase=16),
        infer=dataclasses.replace(InferenceConfig(), boxsize=128))
    model = create_model(config.model, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0), 128, 128)
    pred = Predictor(model, {"params": params, "batch_stats": bs}, config)

    img = np.random.RandomState(0).randint(0, 255, (200, 300, 3), np.uint8)
    boxed, scale = pred.letterbox(img)
    assert boxed.shape == (128, 128, 3)
    assert scale == pytest.approx(128 / 300)
    # content occupies the top-left, scaled region
    ch = int(round(200 * scale))
    assert not np.all(boxed[:ch, :, :] == 128)
    assert np.all(boxed[ch + 1:, :, :] == 128)

    kps, scores, _ = pred.predict_skeletons(img, fixed_size=True)
    # any detected coordinate must lie inside the ORIGINAL image frame
    for person in kps:
        for x, y, v in person:
            if v > 0:
                assert 0 <= x <= 300 / scale and 0 <= y <= 200 / scale
