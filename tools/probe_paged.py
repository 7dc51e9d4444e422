"""Paged vs dense decode on chip: the page indirection's bandwidth cost.

The paged kernel streams the same bytes as the dense decode kernel when
lens are full, plus the table walk; its win is on RAGGED batches (dense
streams max_len rows for every sequence, paged streams lens[b]). Sweeps
page size (the K/V block) — small pages under-utilize the DMA engines,
huge pages waste the ragged clamp's granularity.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_paged.py
"""
import dataclasses

import jax
import jax.numpy as jnp


def main():
    print(jax.devices(), flush=True)
    from ffpa_attn_tpu import (
        PagedKVCache, append_token, ffpa_attn_func, paged_decode_attention,
    )
    from ffpa_attn_tpu.cli._bench import time_chained

    b, hkv, hq, d = 4, 8, 32, 512
    max_len = 4096
    lens = [4096, 2048, 1024, 3072]
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    full_k = jax.random.normal(ks[0], (b, hkv, max_len, d), jnp.bfloat16)
    full_v = jax.random.normal(ks[1], (b, hkv, max_len, d), jnp.bfloat16)
    q = jax.random.normal(ks[2], (b, hq, 1, d), jnp.bfloat16)

    # Dense decode (the contiguous-cache fast path) at FULL max_len per
    # sequence — what serve_batch pays today for a ragged batch.
    def dense(q_, k_, v_):
        return ffpa_attn_func(q_, k_, v_, enable_gqa=True)

    t = time_chained(dense, q, full_k, full_v, iters=8)
    total_gib = 2 * b * hkv * max_len * d * 2 / 2**30
    print(
        f"dense  max_len={max_len}: {t:7.3f} ms  "
        f"({total_gib / (t / 1e3):6.1f} GiB/s effective)",
        flush=True,
    )

    for page, quant in ((128, False), (256, False), (512, False),
                        (256, True), (512, True)):
        cache = PagedKVCache.alloc(
            b, max_len, hkv, d, page_size=page, quantized=quant
        )
        fill = jax.jit(
            lambda cache, ks_, vs_: jax.lax.scan(
                lambda cc, kv: (append_token(cc, kv[0], kv[1]), 0),
                cache, (ks_, vs_),
            )[0]
        )
        c = fill(
            cache,
            full_k.transpose(2, 0, 1, 3)[:, :, :, None, :],
            full_v.transpose(2, 0, 1, 3)[:, :, :, None, :],
        )
        c = dataclasses.replace(c, lens=jnp.asarray(lens, jnp.int32))

        def paged(q_, tbl, lens_, kp, vp, *scales, page=page):
            ks_, vs_ = scales if scales else (None, None)
            cc = PagedKVCache(kp, vp, tbl, lens_, ks_, vs_)
            return paged_decode_attention(q_, cc)

        extra = (c.k_scales, c.v_scales) if quant else ()
        try:
            t = time_chained(
                paged, q, c.page_table, c.lens, c.k_pages, c.v_pages,
                *extra, iters=8,
            )
            itemsize = 1 if quant else 2
            ragged_gib = 2 * hkv * d * itemsize * sum(lens) / 2**30
            tag = "int8" if quant else "bf16"
            print(
                f"paged  page={page:4d} {tag} lens={lens}: {t:7.3f} ms  "
                f"({ragged_gib / (t / 1e3):6.1f} GiB/s on owned bytes)",
                flush=True,
            )
        except Exception as exc:
            print(
                f"paged  page={page:4d} quant={quant}: FAILED "
                f"{str(exc)[:140]}", flush=True,
            )

        if page == 256 and not quant:
            # Windowed paged decode: the page-walk clamp should stream
            # only ~W bytes per sequence regardless of lens (the Mistral/
            # gpt-oss serving shape). Report effective bandwidth on the
            # WINDOW bytes — time should track W, not lens.
            for w in (512, 1024):
                def paged_w(q_, tbl, lens_, kp, vp, w=w):
                    cc = PagedKVCache(kp, vp, tbl, lens_, None, None)
                    return paged_decode_attention(q_, cc, window_left=w)

                try:
                    t = time_chained(
                        paged_w, q, c.page_table, c.lens, c.k_pages,
                        c.v_pages, iters=8,
                    )
                    win_gib = 2 * hkv * d * 2 * sum(
                        min(l, w + 1) for l in lens
                    ) / 2**30
                    print(
                        f"paged  page={page:4d} bf16 window={w}: "
                        f"{t:7.3f} ms  ({win_gib / (t / 1e3):6.1f} GiB/s "
                        f"on window bytes)",
                        flush=True,
                    )
                except Exception as exc:
                    print(
                        f"paged window={w}: FAILED {str(exc)[:140]}",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
