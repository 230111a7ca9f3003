#!/usr/bin/env python
"""Network structure visualisation (reference visual/draw_net.py:1-30 used
graphviz on the autograd graph): prints the Flax module table with per-layer
shapes and parameter counts via ``nn.tabulate``, plus compiler FLOPs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from improved_body_parts_tpu.configs import ModelConfig, get_config
    from improved_body_parts_tpu.models.imhn import create_model

    name = sys.argv[1] if len(sys.argv) > 1 else "Canonical"
    tiny = "--tiny" in sys.argv
    cfg = (ModelConfig(nstack=2, inp_dim=32, increase=16) if tiny
           else get_config(name).model)
    model = create_model(cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    print(nn.tabulate(model, jax.random.PRNGKey(0),
                      depth=2, compute_flops=False)(x, train=False))


if __name__ == "__main__":
    main()
