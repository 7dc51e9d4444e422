"""Flagship model tests: forward shape/finiteness + training-step loss
decrease (the analog of the reference's E2E training validation,
reference README.md:122)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ffpa_attn_tpu.models import (
    ModelConfig,
    forward,
    init_params,
    loss_fn,
    make_train_step,
)

CFG = ModelConfig(
    vocab_size=128,
    d_model=128,
    n_layers=1,
    n_heads=2,
    n_kv_heads=1,
    head_dim=320,  # large-D FFPA path
    max_seq_len=256,
    dtype="bfloat16",
)


def test_forward_shapes_finite():
    params = init_params(jax.random.PRNGKey(0), CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 256), 0, CFG.vocab_size)
    logits = jax.jit(lambda p, t: forward(p, t, CFG))(params, tokens)
    assert logits.shape == (2, 256, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


def test_train_step_reduces_loss():
    params = init_params(jax.random.PRNGKey(0), CFG)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(CFG, optimizer)
    # A fixed batch: loss must drop when memorizing it.
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 257), 0, CFG.vocab_size)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_generate_matches_full_forward():
    """KV-cache decode must reproduce teacher-forced argmax tokens."""
    import jax
    import jax.numpy as jnp

    from ffpa_attn_tpu.models import (
        ModelConfig,
        forward,
        generate,
        init_params,
    )

    cfg = ModelConfig(
        vocab_size=128,
        d_model=64,
        n_layers=2,
        n_heads=2,
        n_kv_heads=1,
        head_dim=320,
        max_seq_len=256,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 160), 0, 128)
    steps = 4
    got = generate(params, prompt, steps, cfg, max_len=256)

    seq = prompt
    for i in range(steps):
        logits = forward(params, seq, cfg)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        assert int(nxt[0]) == int(got[0, i]), (
            f"step {i}: cache={int(got[0, i])} full={int(nxt[0])}"
        )
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
