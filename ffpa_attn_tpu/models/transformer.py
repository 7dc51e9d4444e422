"""FFPA transformer LM: the flagship end-to-end model.

A decoder-only transformer whose attention layers use the FFPA large-head-dim
Pallas kernels (D >= 320), mirroring the reference's E2E validation setup
(Gemma-style blocks with D=512 FFPA layers, reference README.md:122) —
re-designed for TPU: pure-pytree params, jit-able train step, and a mesh
sharding recipe (dp batch x tp heads x sp sequence-ring).

Intentionally minimal (no flax dependency): params are nested dicts, the
forward is a lax-friendly pure function.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..interface import ffpa_attn_func
from ..parallel.ring import ring_attention_sharded


@dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    d_model: int = 1024
    n_layers: int = 2
    n_heads: int = 4
    n_kv_heads: int = 2
    head_dim: int = 512  # large head dim — the FFPA regime
    mlp_ratio: int = 4
    max_seq_len: int = 8192
    dtype: str = "bfloat16"
    # S-resident attention backward (ops/attention.py): in a STACKED model
    # without layer remat, every layer's S residual is live at once —
    # n_layers * B*H*N^2 bytes — so the layer default is the dS-handoff
    # (fwd 2 + bwd 5 matmul-units beats remat+S-resident's 8). Set True
    # for short sequences or when layers run under jax.checkpoint (then
    # only one layer's S is live at a time).
    attn_save_scores: bool = False
    # Mistral/Gemma-style attention features (FFPA's beyond-reference
    # kwargs, docs/api.md): sliding_window = causal left-window width in
    # tokens (0 = full attention); attn_softcap = logit cap (0 = off);
    # attn_sinks = LEARNABLE per-head sink logits (gpt-oss-style), stored
    # as a (n_heads,) param per layer and trained with the model.
    sliding_window: int = 0
    attn_softcap: float = 0.0
    attn_sinks: bool = False

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    # -- family presets (attention-feature combinations of the public
    # model families these kwargs exist for; sizes stay caller-chosen) --

    @classmethod
    def mistral_like(cls, sliding_window: int = 4096, **kw) -> "ModelConfig":
        """Causal sliding-window attention (Mistral-7B-style)."""
        return cls(sliding_window=sliding_window, **kw)

    @classmethod
    def gemma2_like(cls, sliding_window: int = 4096,
                    attn_softcap: float = 50.0, **kw) -> "ModelConfig":
        """Logit soft-capping + sliding window (Gemma-2-style)."""
        return cls(
            sliding_window=sliding_window, attn_softcap=attn_softcap, **kw
        )

    @classmethod
    def gpt_oss_like(cls, sliding_window: int = 128, **kw) -> "ModelConfig":
        """Learnable attention sinks + sliding window (gpt-oss-style)."""
        return cls(sliding_window=sliding_window, attn_sinks=True, **kw)


def _dense_init(key, shape, dtype, scale=None):
    fan_in = shape[0]
    scale = scale if scale is not None else 1.0 / (fan_in ** 0.5)
    return (jax.random.normal(key, shape) * scale).astype(dtype)


def init_params(key, cfg: ModelConfig):
    dtype = cfg.jnp_dtype
    keys = jax.random.split(key, cfg.n_layers + 2)
    params = {
        "embed": _dense_init(
            keys[0], (cfg.vocab_size, cfg.d_model), dtype, scale=0.02
        ),
        "final_norm": jnp.ones((cfg.d_model,), dtype),
        "layers": [],
    }
    dh = cfg.head_dim
    for i in range(cfg.n_layers):
        lk = jax.random.split(keys[i + 1], 8)
        layer = {
            "attn_norm": jnp.ones((cfg.d_model,), dtype),
            "wq": _dense_init(lk[0], (cfg.d_model, cfg.n_heads * dh), dtype),
            "wk": _dense_init(lk[1], (cfg.d_model, cfg.n_kv_heads * dh), dtype),
            "wv": _dense_init(lk[2], (cfg.d_model, cfg.n_kv_heads * dh), dtype),
            "wo": _dense_init(lk[3], (cfg.n_heads * dh, cfg.d_model), dtype),
            "mlp_norm": jnp.ones((cfg.d_model,), dtype),
            "w_up": _dense_init(
                lk[4], (cfg.d_model, cfg.mlp_ratio * cfg.d_model), dtype
            ),
            "w_gate": _dense_init(
                lk[5], (cfg.d_model, cfg.mlp_ratio * cfg.d_model), dtype
            ),
            "w_down": _dense_init(
                lk[6], (cfg.mlp_ratio * cfg.d_model, cfg.d_model), dtype
            ),
        }
        if cfg.attn_sinks:
            layer["attn_sinks"] = jnp.zeros((cfg.n_heads,), jnp.float32)
        params["layers"].append(layer)
    return params


def param_specs(cfg: ModelConfig, tp_axis: Optional[str] = "tp"):
    """PartitionSpecs: head-dim projections sharded on the tp axis
    (megatron-style), everything else replicated."""
    t = tp_axis
    layer = {
        "attn_norm": P(),
        "wq": P(None, t),
        "wk": P(None, t),
        "wv": P(None, t),
        "wo": P(t, None),
        "mlp_norm": P(),
        "w_up": P(None, t),
        "w_gate": P(None, t),
        "w_down": P(t, None),
    }
    if cfg.attn_sinks:
        layer["attn_sinks"] = P()
    return {
        "embed": P(),
        "final_norm": P(),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
    }


def shard_params(params, mesh: Mesh, cfg: ModelConfig, tp_axis="tp"):
    specs = param_specs(cfg, tp_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray),
    )


def _rmsnorm(x, w, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rope(x, positions, base=10000.0):
    """Rotary embedding over the last dim (applied per head)."""
    d = x.shape[-1]
    half = d // 2
    freqs = 1.0 / (
        base ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., N, half]
    cos = jnp.cos(angles)[None, None]
    sin = jnp.sin(angles)[None, None]
    x1, x2 = x[..., :half], x[..., half:]
    xr1 = x1.astype(jnp.float32) * cos - x2.astype(jnp.float32) * sin
    xr2 = x2.astype(jnp.float32) * cos + x1.astype(jnp.float32) * sin
    return jnp.concatenate([xr1, xr2], axis=-1).astype(x.dtype)


def _attention(layer, x, cfg: ModelConfig, mesh: Optional[Mesh], sp_axis, tp_axis):
    b, n, _ = x.shape
    dh = cfg.head_dim
    q = (x @ layer["wq"]).reshape(b, n, cfg.n_heads, dh).transpose(0, 2, 1, 3)
    k = (x @ layer["wk"]).reshape(b, n, cfg.n_kv_heads, dh).transpose(0, 2, 1, 3)
    v = (x @ layer["wv"]).reshape(b, n, cfg.n_kv_heads, dh).transpose(0, 2, 1, 3)

    positions = jnp.arange(n)
    q = _rope(q, positions)
    k = _rope(k, positions)

    if mesh is not None and sp_axis is not None and mesh.shape[sp_axis] > 1:
        s_count = mesh.shape[sp_axis]
        head_axis = None if mesh.shape.get(tp_axis, 1) == 1 else tp_axis
        if cfg.sliding_window > 0:
            # Window models shard by HALO EXCHANGE, not a ring: each chip
            # fetches ceil(W/Nl) left-neighbor KV shards once and every
            # query's window is local (parallel/window.py) — softcap and
            # sinks compose exactly (merge-free structure).
            from ..parallel.window import window_attention_sharded

            o = window_attention_sharded(
                q, k, v, mesh,
                seq_axis=sp_axis, head_axis=head_axis,
                window_left=cfg.sliding_window,
                softcap=cfg.attn_softcap,
                sinks=layer["attn_sinks"] if cfg.attn_sinks else None,
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.n_heads * dh)
            return o @ layer["wo"]
        if cfg.attn_softcap > 0.0 or cfg.attn_sinks:
            raise NotImplementedError(
                "attn_softcap/attn_sinks without a sliding window are not "
                "wired through the sequence-parallel ring (its per-step "
                "partial softmaxes cannot host them); set sliding_window "
                "or run without sp"
            )
        if n % (2 * s_count) == 0:
            # Zigzag layout: each chip owns one early + one late chunk, so
            # the causal FLOP saving survives sharding (parallel/zigzag.py;
            # the naive causal ring leaves chip 0 idle most steps).
            from ..parallel.zigzag import zigzag_ring_attention_sharded

            o = zigzag_ring_attention_sharded(
                q, k, v, mesh, seq_axis=sp_axis, head_axis=head_axis,
            )
        else:
            # Fallback for lengths the 2S-chunk layout can't split evenly.
            o = ring_attention_sharded(
                q, k, v, mesh,
                seq_axis=sp_axis, head_axis=head_axis, causal=True,
            )
    else:
        from ..functional import PallasBackend

        extra = {}
        if cfg.sliding_window > 0:
            extra["window_size"] = (cfg.sliding_window, -1)
        if cfg.attn_softcap > 0.0:
            extra["softcap"] = cfg.attn_softcap
        if cfg.attn_sinks:
            extra["sinks"] = layer["attn_sinks"]
        o = ffpa_attn_func(
            q, k, v, is_causal=True,
            enable_gqa=cfg.n_heads != cfg.n_kv_heads,
            backward_backend=PallasBackend(save_scores=cfg.attn_save_scores),
            **extra,
        )
    o = o.transpose(0, 2, 1, 3).reshape(b, n, cfg.n_heads * dh)
    return o @ layer["wo"]


def _mlp(layer, x):
    up = x @ layer["w_up"]
    gate = jax.nn.silu(x @ layer["w_gate"])
    return (up * gate) @ layer["w_down"]


def forward(
    params,
    tokens,
    cfg: ModelConfig,
    mesh: Optional[Mesh] = None,
    sp_axis: Optional[str] = None,
    tp_axis: str = "tp",
):
    """LM forward: tokens [B, N] int32 -> logits [B, N, vocab]."""
    x = params["embed"][tokens]
    for layer in params["layers"]:
        h = _rmsnorm(x, layer["attn_norm"])
        x = x + _attention(layer, h, cfg, mesh, sp_axis, tp_axis)
        h = _rmsnorm(x, layer["mlp_norm"])
        x = x + _mlp(layer, h)
    x = _rmsnorm(x, params["final_norm"])
    return x @ params["embed"].T


def loss_fn(params, tokens, cfg: ModelConfig, mesh=None, sp_axis=None):
    logits = forward(params, tokens[:, :-1], cfg, mesh, sp_axis)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(
    cfg: ModelConfig,
    optimizer,
    mesh: Optional[Mesh] = None,
    sp_axis: Optional[str] = None,
    dp_axis: Optional[str] = "dp",
):
    """Build a jitted SGD/optax train step; shardings via NamedSharding when
    a mesh is given (dp on batch, tp inside params, sp ring inside attn)."""

    def step(params, opt_state, tokens):
        if mesh is not None and dp_axis is not None:
            tokens = jax.lax.with_sharding_constraint(
                tokens, NamedSharding(mesh, P(dp_axis, None))
            )
        loss, grads = jax.value_and_grad(loss_fn)(
            params, tokens, cfg, mesh, sp_axis
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: (p.astype(jnp.float32) + u).astype(p.dtype), params, updates
        )
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
