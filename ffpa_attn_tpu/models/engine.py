"""Continuous-batching serving engine: dynamic admission over paged pools.

``serve_batch_paged`` serves a FIXED batch to completion. Production
serving is continuous: requests arrive and finish at different times, and
the batch membership changes every few steps. This engine supplies that
layer on top of the paged tier (ops/paged.py):

* device state is jit-static — per-layer page POOLS never change shape;
  admission/eviction happens BETWEEN jitted decode steps by rewriting one
  page-table row (``assign_sequence``) and filling the slot's pages from
  the new request's prefill (``fill_slot``);
* the host owns page accounting through ONE ``PageAllocator`` (tables are
  identical across layers, so a slot's page run is acquired once and
  reused by every layer's pool);
* idle slots point at the null page with ``lens`` frozen at capacity, so
  the decode kernel's clamped page walk streams (elided) null-page repeats
  and their outputs are ignored — no recompile, no shape change;
* each ``step()`` runs ONE jitted batch decode step, then the host checks
  for finished requests (token budget or EOS), releases their pages, and
  admits queued requests into the freed slots.

The reference has no serving story at all; this completes FFPA-TPU's
serving tier from kernel (paged decode) through memory (allocator/pools)
to engine (dynamic membership).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from .transformer import ModelConfig


@dataclass
class _Slot:
    active: bool = False
    request_id: int = -1
    pages: list = field(default_factory=list)
    prompt_len: int = 0
    emitted: list = field(default_factory=list)
    max_new: int = 0


@functools.partial(jax.jit, static_argnames=("cfg",))
def _engine_decode_step(params, caches, token, cfg: ModelConfig):
    from .serving import _paged_decode_step

    return _paged_decode_step(params, caches, token, cfg)


class ServingEngine:
    """Dynamic continuous batching over per-layer paged KV pools.

    Usage::

        eng = ServingEngine(params, cfg, batch_slots=4, max_len=4096)
        rid = eng.submit(prompt_tokens, max_new_tokens=128)
        while not eng.done():
            finished = eng.step()   # {request_id: [tokens...]} completions

    ``eos_id``: optional early-stop token. Prefill runs per admitted
    request (B=1 dense) and loads the slot's pages in page-sized DMAs.
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        batch_slots: int,
        max_len: int,
        page_size: int = 128,
        quantized: bool = False,
        eos_id: Optional[int] = None,
        extra_pages: Optional[int] = None,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 1.0,
        seed: int = 0,
    ):
        from ..ops.paged import PageAllocator, PagedKVCache, cdiv

        self.params = params
        self.cfg = cfg
        self.batch = batch_slots
        self.max_len = max_len
        self.page_size = page_size
        self.eos_id = eos_id
        self.max_pages = cdiv(max_len, page_size)
        num_pages = 1 + batch_slots * self.max_pages + (extra_pages or 0)
        self.alloc = PageAllocator(num_pages, reserved=1)

        def empty_pool():
            # extra_pages must size the PHYSICAL pools too — the allocator
            # hands those ids out, and an out-of-range page id would be
            # silently clamped by dynamic_update_slice (page aliasing).
            c = PagedKVCache.alloc(
                batch_slots, max_len, cfg.n_kv_heads, cfg.head_dim,
                page_size=page_size, dtype=cfg.jnp_dtype,
                quantized=quantized, extra_pages=extra_pages or 0,
            )
            # alloc() pre-assigns contiguous pages; the engine owns the
            # table instead: all slots start idle on the null page with
            # lens frozen at capacity (the decode kernel then streams only
            # elided null repeats for them).
            import dataclasses

            return dataclasses.replace(
                c,
                page_table=jnp.zeros_like(c.page_table),
                lens=jnp.full((batch_slots,), max_len, jnp.int32),
            )

        self.caches = [empty_pool() for _ in range(cfg.n_layers)]
        self.slots = [_Slot() for _ in range(batch_slots)]
        self.tokens = jnp.zeros((batch_slots,), jnp.int32)
        self.queue: list = []
        self._next_id = 0
        self.steps_run = 0
        # Requests that complete outside step()'s decode (degenerate
        # budgets, EOS on the prefill token) buffer here until drained.
        self._completed: dict = {}
        # Sampling controls (temperature 0 = greedy); one PRNG stream for
        # the whole engine — deterministic per (seed, arrival order).
        self.temperature = float(temperature)
        self.top_k = int(top_k)
        self.top_p = float(top_p)
        self._key = jax.random.PRNGKey(seed)

    def _sample(self, logits):
        from .sampling import sample_logits

        self._key, sub = jax.random.split(self._key)
        return sample_logits(
            logits, sub, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p,
        )

    # -- request lifecycle -------------------------------------------------

    def submit(self, prompt, max_new_tokens: int) -> int:
        prompt = jnp.asarray(prompt, jnp.int32)
        if max_new_tokens < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new_tokens}")
        if int(prompt.shape[0]) + 1 > self.max_len:
            # A slot must hold the prompt plus at least one generated row.
            raise ValueError(
                f"prompt of {int(prompt.shape[0])} tokens cannot fit a slot "
                f"of max_len={self.max_len}"
            )
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, prompt, max_new_tokens))
        self._admit()
        return rid

    def done(self) -> bool:
        return (
            not self.queue
            and not self._completed  # step() must drain instant finishes
            and not any(s.active for s in self.slots)
        )

    # -- internals -----------------------------------------------------------

    def _admit(self) -> None:
        from ..ops.paged import assign_sequence, cdiv, fill_slot
        from .generate import init_kv_cache, prefill

        # A degenerate request (budget 1 / instant EOS) frees its slot
        # during this pass; keep admitting until no slot can take work.
        while self.queue and (i := self._free_slot()) is not None:
            rid, prompt, max_new = self.queue[0]
            n = int(prompt.shape[0])
            # Prompt length was validated at submit(); the slot row budget
            # is clipped to max_len, so need <= max_pages by construction.
            need = cdiv(min(n + max_new, self.max_len), self.page_size)
            pages = self.alloc.acquire(need)
            if pages is None:
                if not any(s.active for s in self.slots):
                    raise RuntimeError(
                        f"request {rid} needs {need} pages but only "
                        f"{self.alloc.free_pages} are free with an idle "
                        "batch — pool too small (raise extra_pages)"
                    )
                return  # pool full; request waits for evictions
            self.queue.pop(0)

            # Prefill the request alone (B=1 dense), then load its pages.
            pad = cdiv(n, self.page_size) * self.page_size
            dense = init_kv_cache(self.cfg, 1, pad)
            logits, dense = prefill(
                self.params, prompt[None], self.cfg, dense
            )
            first = self._sample(logits)[0]
            for li in range(self.cfg.n_layers):
                self.caches[li] = assign_sequence(self.caches[li], i, pages)
                self.caches[li] = fill_slot(
                    self.caches[li], i, dense[li]["k"][0], dense[li]["v"][0], n
                )
            self.tokens = self.tokens.at[i].set(first)
            self.slots[i] = _Slot(
                active=True, request_id=rid, pages=pages, prompt_len=n,
                emitted=[int(first)], max_new=max_new,
            )
            # The prefill token may already complete the request (token
            # budget of 1, or EOS straight away) — finish before any
            # decode step so the budget is never exceeded.
            if max_new <= 1 or (
                self.eos_id is not None and int(first) == self.eos_id
            ):
                self._finish(i, self._completed)

    def _free_slot(self):
        for i, slot in enumerate(self.slots):
            if not slot.active:
                return i
        return None

    def _finish(self, i: int, finished: dict) -> None:
        import dataclasses

        from ..ops.paged import assign_sequence

        slot = self.slots[i]
        finished[slot.request_id] = slot.emitted
        self.alloc.release(slot.pages)
        for li in range(self.cfg.n_layers):
            # Idle again: null table row, lens frozen at capacity (the
            # decode kernel then only streams elided null-page repeats).
            c = assign_sequence(self.caches[li], i, [])
            self.caches[li] = dataclasses.replace(
                c, lens=c.lens.at[i].set(self.max_len)
            )
        self.slots[i] = _Slot()

    def step(self) -> dict:
        """One batch decode step; returns completions {request_id: tokens}."""
        import numpy as np

        finished, self._completed = self._completed, {}
        if not any(s.active for s in self.slots):
            self._admit()
            finished.update(self._completed)
            self._completed = {}
            if not any(s.active for s in self.slots):
                return finished

        logits, self.caches = _engine_decode_step(
            self.params, self.caches, self.tokens, self.cfg
        )
        nxt = self._sample(logits)
        self.tokens = nxt
        self.steps_run += 1
        # ONE device->host transfer each for tokens and lens (a per-slot
        # int() would serialize a round trip per active slot per step).
        nxt_host = np.asarray(nxt)
        lens_host = np.asarray(self.caches[0].lens)

        for i, slot in enumerate(self.slots):
            if not slot.active:
                continue
            slot.emitted.append(int(nxt_host[i]))
            hit_eos = (
                self.eos_id is not None and int(nxt_host[i]) == self.eos_id
            )
            cap = int(lens_host[i]) >= min(
                slot.prompt_len + slot.max_new, self.max_len
            )
            if hit_eos or cap or len(slot.emitted) >= slot.max_new:
                self._finish(i, finished)
        self._admit()
        finished.update(self._completed)
        self._completed = {}
        return finished


__all__ = ["ServingEngine"]
