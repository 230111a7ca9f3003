"""True numerics parity: a torch mirror of the reference IMHN (reference
module names, random weights + random BN running stats) is converted through
utils/checkpoint.convert_torch_state_dict and the Flax forward must match
the torch forward to float tolerance at every stack and scale.

This is the guarantee that the released reference ``.pth`` checkpoints load
correctly without retraining."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from improved_body_parts_tpu.configs import ModelConfig
from improved_body_parts_tpu.models.imhn import create_model
from improved_body_parts_tpu.utils.checkpoint import (
    convert_torch_state_dict, verify_tree_match,
)
from torch_mirror import TPoseNet


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    cfg = ModelConfig(nstack=2, inp_dim=32, increase=16, oup_dim=50,
                      se_reduction=8)
    tmodel = TPoseNet(nstack=2, inp_dim=32, oup_dim=50, increase=16,
                      reduction=8)
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
            if isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0, 0.05)
                if m.bias is not None:
                    m.bias.normal_(0, 0.05)
    tmodel.eval()
    fmodel = create_model(cfg, dtype=jnp.float32)
    return tmodel, fmodel


def test_forward_numerics_match(pair):
    tmodel, fmodel = pair
    params, batch_stats = convert_torch_state_dict(tmodel.state_dict())

    # the converted tree must exactly cover the flax model's expected tree
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    expected = jax.eval_shape(
        lambda r, x: fmodel.init(r, x, train=False), jax.random.PRNGKey(0), dummy)
    issues = verify_tree_match(params, expected["params"])
    issues += verify_tree_match(batch_stats, expected["batch_stats"], "bs")
    assert not issues, "\n".join(issues[:20])

    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(imgs))
    f_out = fmodel.apply({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(imgs), train=False)

    for t in range(2):
        for s in range(5):
            want = t_out[t][s].numpy().transpose(0, 2, 3, 1)  # NCHW->NHWC
            got = np.asarray(f_out[t][s])
            np.testing.assert_allclose(
                got, want, rtol=2e-4, atol=2e-4,
                err_msg=f"stack {t} scale {s}")


def test_export_round_trips_state_dict(pair):
    """flax -> torch export (utils/checkpoint.export_to_torch_state_dict) is
    the exact inverse of the torch -> flax converter: every tensor of the
    reference-format state_dict round-trips bit-for-bit. This is what lets a
    checkpoint trained HERE run under the reference code for A/B evals."""
    from improved_body_parts_tpu.utils.checkpoint import (
        export_to_torch_state_dict,
    )
    tmodel, _ = pair
    sd = tmodel.state_dict()
    params, batch_stats = convert_torch_state_dict(sd)
    exported = export_to_torch_state_dict(params, batch_stats, sd)
    assert set(exported.keys()) == set(sd.keys())
    for k, tval in sd.items():
        want = tval.detach().cpu().numpy()
        np.testing.assert_array_equal(exported[k], want, err_msg=k)

    # and the exported dict actually loads into a fresh torch module with
    # identical eval-mode forward numerics
    fresh = TPoseNet(nstack=2, inp_dim=32, oup_dim=50, increase=16,
                     reduction=8)
    fresh.load_state_dict({k: torch.from_numpy(np.array(v))
                           for k, v in exported.items()})
    fresh.eval()
    x = torch.from_numpy(
        np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32))
    with torch.no_grad():
        a = tmodel(x)
        b = fresh(x)
    for t in range(2):
        for s in range(5):
            np.testing.assert_array_equal(a[t][s].numpy(), b[t][s].numpy())
