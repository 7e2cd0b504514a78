"""Continuous-batching decode engine.

Serving loop over a fixed pool of batch slots: sequences at different stages
decode together in one jitted step; when a sequence finishes (eos / length),
its slot is immediately refilled from the pending queue by a prefill that
scatters the new prompt's KV into that slot — no draining of the whole batch
between requests.  The reference has nothing comparable (one-by-one full
re-forward generation, SURVEY.md §3.5); this is the BASELINE.json
"continuous batching" capability.

Host/device split:
  * device: one compiled decode step (all slots, KV-cache attention via the
    flash-decode kernel) and one compiled prefill per prompt-length bucket
    (prompts are padded to power-of-two buckets to bound compilations);
  * host: request queue, slot bookkeeping, detokenization — cheap, and
    overlaps with device execution thanks to async dispatch.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.inference.kv_cache import KVCache
from tpu_flash.inference.sampler import SamplingConfig, _sample_token, make_caches


@dataclasses.dataclass
class Request:
    uid: int
    prompt: list[int]


@dataclasses.dataclass
class Completion:
    uid: int
    tokens: list[int]
    finished_reason: str    # "eos" | "length"


def _scatter_subcaches(caches, subs, slot_onehot, length):
    """Copy a 1-slot sub-cache list into the slot selected by the one-hot
    mask, pinning that slot's length.  Sub-caches may be LONGER along the
    positions axis than the main caches (chunked prefill over-allocates by
    one chunk so a pad-filled final chunk never clamp-writes at max_len);
    the extra tail rows are pure padding and are sliced off here."""
    n_slots = slot_onehot.shape[0]

    def scatter(main, one):
        def mix(a, b, axis):
            if a is None:
                return None
            if b.shape[axis] != a.shape[axis]:
                b = jax.lax.slice_in_dim(b, 0, a.shape[axis], axis=axis)
            shape = (n_slots,) + (1,) * (a.ndim - 1)
            return jnp.where(slot_onehot.reshape(shape),
                             b.astype(a.dtype), a)

        return KVCache(
            mix(main.k, one.k, 1), mix(main.v, one.v, 1),
            mix(main.k_scale, one.k_scale, 2),
            mix(main.v_scale, one.v_scale, 2),
            jnp.where(slot_onehot, length, main.lengths),
            main.quant, main.compute_dtype,
            n_head=main.n_head)

    return [scatter(m, o) for m, o in zip(caches, subs)]


def _bucket(n: int, buckets=(16, 32, 64, 128, 256, 512, 1024)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class DecodeEngine:
    """Fixed-slot continuous batching around a DecoderLM."""

    def __init__(self, model, params, *, n_slots: int, max_len: int,
                 sampling: SamplingConfig, kv_quant: str = "none",
                 pad_id: int = 0, seed: int = 0,
                 draft_model=None, draft_params=None, n_draft: int = 4,
                 draft_kv_quant: str = "none",
                 prefill_chunk: int | None = None):
        self.model = model
        self.params = params
        self.n_slots = n_slots
        self.max_len = max_len
        self.sampling = sampling
        self.pad_id = pad_id
        self.key = jax.random.key(seed)
        # chunked prefill: admissions run the prompt through the model in
        # fixed-size chunks with a decode step for the active slots between
        # chunks, so a long admission adds at most ~chunk tokens of prefill
        # compute to any active request's inter-token latency (and ONE
        # compilation replaces the per-bucket prefill ladder)
        self.prefill_chunk = prefill_chunk
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError(f"prefill_chunk must be >= 1, "
                             f"got {prefill_chunk}")
        self._prefix = None          # shared-prefix cache (set_prefix)
        self._prefix_caches = {}
        self._prefix_last = None

        self.caches = make_caches(model, n_slots, max_len, quant=kv_quant,
                                  compute_dtype=model.cfg.dtype)
        self.last_tokens = jnp.zeros((n_slots,), jnp.int32)
        # host-side bookkeeping
        self.slot_uid: list[int | None] = [None] * n_slots
        self.slot_tokens: list[list[int]] = [[] for _ in range(n_slots)]
        self.slot_budget: list[int] = [0] * n_slots
        self.slot_len: list[int] = [0] * n_slots    # host mirror of kv lengths
        self.queue: list[Request] = []
        self.completions: list[Completion] = []

        self._decode_step = jax.jit(self._decode_step_impl)
        self._prefill = {}       # (is_draft, bucket) -> jitted fn
        self._chunk_prefill = {}  # is_draft -> jitted fn (chunked mode)
        self._scatter = None      # jitted sub-cache -> slot scatter
        self._decode_multi = {}  # n_steps -> jitted fn

        # optional speculative decoding: a draft model with its own slot
        # caches; step_speculative() emits up to n_draft tokens per
        # verification round (and per host round-trip)
        self.draft_model = draft_model
        self.draft_params = draft_params
        self.n_draft = n_draft
        if draft_model is not None:
            if n_draft < 1:
                raise ValueError(f"n_draft must be >= 1, got {n_draft}")
            self.draft_caches = make_caches(
                draft_model, n_slots, max_len, quant=draft_kv_quant,
                compute_dtype=draft_model.cfg.dtype)
            self._spec_step = {}  # round width W -> jitted fn
        # acceptance-aware guard bookkeeping (run_speculative probation,
        # VERDICT r4 #4): wall-timed samples of both modes, compile calls
        # excluded, plus raw acceptance counters for observability.
        self._spec_stats = dict(rounds=0, proposed=0, emitted=0, accepted=0,
                                spec_timed=0, spec_s=0.0, spec_tok=0,
                                plain_timed=0, plain_s=0.0, plain_tok=0)
        self._spec_compiled: set[int] = set()   # W values already compiled
        self._plain_compiled = False
        self.spec_decision: dict | None = None

    # ------------------------------------------------------------------ API
    def set_prefix(self, prefix) -> None:
        """Shared-prefix (system-prompt) caching: prefill ``prefix`` ONCE
        into a detached 1-slot cache; every admission whose prompt starts
        with it copies the cached KV (free — arrays are immutable) and
        prefills only the remainder.  Requires chunked-prefill mode."""
        if self.prefill_chunk is None:
            raise ValueError("set_prefix requires prefill_chunk mode "
                             "(DecodeEngine(prefill_chunk=C))")
        prefix = list(prefix)
        if not prefix or len(prefix) >= self.max_len - 1:
            raise ValueError(f"prefix length {len(prefix)} must be in "
                             f"[1, max_len-1)")
        C = self.prefill_chunk
        self._prefix = prefix
        self._prefix_caches = {}
        for is_draft, model, params, attr in self._prefill_targets():
            quant = getattr(self, attr)[0].quant
            dtype = getattr(self, attr)[0].compute_dtype
            # over-allocate one chunk of positions: a pad-filled final
            # chunk must never clamp-write at max_len (scatter trims)
            sub = make_caches(model, 1, self.max_len + C, quant=quant,
                              compute_dtype=dtype)
            fn = self._get_chunk_prefill(draft=is_draft)
            n_chunks = -(-len(prefix) // C)
            for t in range(n_chunks):
                ids = np.full((C,), self.pad_id, np.int32)
                seg = prefix[t * C:(t + 1) * C]
                ids[: len(seg)] = seg
                logits, sub = fn(params, sub, jnp.asarray(ids),
                                 jnp.asarray(t * C, jnp.int32))
            # chunk padding advanced lengths past the true prefix; pin them
            # back so remainder chunks (and their positions) start exactly
            # at len(prefix) — the pad rows get overwritten
            import dataclasses as _dc
            sub = [_dc.replace(
                c, lengths=jnp.full_like(c.lengths, len(prefix)))
                for c in sub]
            self._prefix_caches[is_draft] = sub
            if not is_draft:
                self._prefix_last = logits[
                    0, (len(prefix) - 1) - (n_chunks - 1) * C]

    def _prefill_targets(self):
        targets = [(False, self.model, self.params, "caches")]
        if self.draft_model is not None:
            targets.append(
                (True, self.draft_model, self.draft_params, "draft_caches"))
        return targets

    def submit(self, req: Request) -> None:
        self.queue.append(req)

    def has_work(self) -> bool:
        return bool(self.queue) or any(u is not None for u in self.slot_uid)

    def run(self) -> list[Completion]:
        """Drain the queue; returns all completions."""
        while self.has_work():
            self.admit()
            self.step()
        out, self.completions = self.completions, []
        return out

    # ------------------------------------------------------------ internals
    def _decode_step_impl(self, params, caches, tokens, active, key):
        """One token for every slot (inactive slots masked)."""
        positions = caches[0].lengths[:, None]
        logits, caches = self.model(params, tokens[:, None],
                                    kv_caches=caches, positions=positions)
        nxt = _sample_token(logits[:, 0, :], self.sampling, key)
        nxt = jnp.where(active, nxt, self.pad_id)
        return nxt, caches

    def _get_prefill(self, bucket: int, *, draft: bool = False) -> Callable:
        if (draft, bucket) not in self._prefill:
            model = self.draft_model if draft else self.model

            def prefill(params, caches, slot_onehot, ids, length):
                """Run a single prompt (padded to `bucket`) and scatter its
                per-layer KV into the slot selected by `slot_onehot` [S]."""
                sub = [KVCache.create(
                    1, model.cfg.kv_heads, self.max_len,
                    model.cfg.attn_hidden_dim, quant=c.quant,
                    compute_dtype=c.compute_dtype) for c in caches]
                positions = jnp.arange(bucket, dtype=jnp.int32)[None, :]
                logits, sub = model(params, ids[None, :],
                                    kv_caches=sub, positions=positions)
                last = jnp.take_along_axis(
                    logits, (length - 1)[None, None, None], axis=1)[0, 0]

                caches = _scatter_subcaches(caches, sub, slot_onehot, length)
                return last, caches
            self._prefill[(draft, bucket)] = jax.jit(prefill)
        return self._prefill[(draft, bucket)]

    def _get_chunk_prefill(self, *, draft: bool = False) -> Callable:
        """One fixed-size prompt chunk through the model into a detached
        1-slot sub-cache (batch 1); ``start`` is the chunk's first position."""
        if draft not in self._chunk_prefill:
            model = self.draft_model if draft else self.model
            C = self.prefill_chunk

            def chunk(params, sub, ids, start):
                positions = (start
                             + jnp.arange(C, dtype=jnp.int32))[None, :]
                logits, sub = model(params, ids[None, :], kv_caches=sub,
                                    positions=positions)
                return logits, sub

            self._chunk_prefill[draft] = jax.jit(chunk)
        return self._chunk_prefill[draft]

    def _get_scatter(self) -> Callable:
        """Jitted copy of a 1-slot sub-cache into the slot selected by a
        one-hot mask (shared epilogue with the bucketed prefill)."""
        if self._scatter is None:
            self._scatter = jax.jit(_scatter_subcaches)
        return self._scatter

    def _chunked_prefill(self, slot: int, prompt) -> jax.Array:
        """Admit one prompt in ``prefill_chunk``-sized pieces, running a
        decode step for the already-active slots after each chunk: the
        admission's latency cost to in-flight requests is bounded by one
        chunk of prefill compute instead of the full prompt.  The chunks
        write a detached sub-cache, so the interleaved decode steps and the
        final slot scatter cannot race.  Returns the prompt's last-token
        logits."""
        C = self.prefill_chunk
        prompt = list(prompt)
        onehot = np.zeros((self.n_slots,), bool)
        onehot[slot] = True
        onehot = jnp.asarray(onehot)
        length = jnp.asarray(len(prompt), jnp.int32)
        # shared-prefix reuse: skip recomputing a cached system prompt
        base = 0
        if (self._prefix is not None
                and prompt[: len(self._prefix)] == self._prefix):
            base = len(self._prefix)
        rest = prompt[base:]
        n_chunks = -(-len(rest) // C)
        last = None
        for is_draft, model, params, attr in self._prefill_targets():
            if base:
                sub = self._prefix_caches[is_draft]   # immutable: free copy
            else:
                quant = getattr(self, attr)[0].quant
                dtype = getattr(self, attr)[0].compute_dtype
                # over-allocated like set_prefix: the final pad-filled
                # chunk may write past max_len (scatter trims the tail)
                sub = make_caches(model, 1, self.max_len + C, quant=quant,
                                  compute_dtype=dtype)
            fn = self._get_chunk_prefill(draft=is_draft)
            for t in range(n_chunks):
                ids = np.full((C,), self.pad_id, np.int32)
                seg = rest[t * C:(t + 1) * C]
                ids[: len(seg)] = seg
                logits, sub = fn(params, sub, jnp.asarray(ids),
                                 jnp.asarray(base + t * C, jnp.int32))
                # bound active slots' inter-token latency — but NOT in
                # speculative mode: a plain step() appends tokens to the
                # target caches only, and the skipped draft-cache append
                # would leave the draft's context permanently behind
                if (not is_draft and t < n_chunks - 1
                        and self.draft_model is None):
                    self.step()
            # re-read the live caches: the interleaved decode steps above
            # advanced them since this admission started
            setattr(self, attr, self._get_scatter()(
                getattr(self, attr), sub, onehot, length))
            if not is_draft:
                last = (self._prefix_last if n_chunks == 0
                        else logits[0, (len(rest) - 1) - (n_chunks - 1) * C])
        return last

    def admit(self) -> None:
        """Fill free slots from the queue (one prefill per admission)."""
        for slot in range(self.n_slots):
            if self.slot_uid[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            prompt = req.prompt[: self.max_len - 1]
            self.key, sub = jax.random.split(self.key)
            if self.prefill_chunk is not None:
                last_logits = self._chunked_prefill(slot, prompt)
            else:
                bucket = min(_bucket(len(prompt)), self.max_len)
                ids = np.full((bucket,), self.pad_id, np.int32)
                ids[: len(prompt)] = prompt
                onehot = np.zeros((self.n_slots,), bool)
                onehot[slot] = True
                last_logits, self.caches = self._get_prefill(bucket)(
                    self.params, self.caches, jnp.asarray(onehot),
                    jnp.asarray(ids), jnp.asarray(len(prompt), jnp.int32))
                if self.draft_model is not None:
                    _, self.draft_caches = self._get_prefill(
                        bucket, draft=True)(
                        self.draft_params, self.draft_caches,
                        jnp.asarray(onehot), jnp.asarray(ids),
                        jnp.asarray(len(prompt), jnp.int32))
            first = _sample_token(last_logits[None, :], self.sampling, sub)
            tok = int(first[0])
            self.slot_uid[slot] = req.uid
            self.slot_tokens[slot] = []
            self.slot_budget[slot] = self.sampling.max_new_tokens
            self.slot_len[slot] = len(prompt)
            self._host_emit(slot, tok, self.slot_len[slot])

    def _host_emit(self, slot: int, tok: int, slot_len: int,
                   update_last: bool = True) -> None:
        """Record a generated token; retire the slot on eos/length.

        ``slot_len`` is the slot's HOST-KNOWN kv length as of THIS token
        (reading ``caches[0].lengths[slot]`` here would be a device sync per
        token — measured at ~100+ ms/token over the tunnel, swamping
        decode).  ``update_last=False`` skips the ``last_tokens`` device
        update for callers that already set it wholesale (step_many)."""
        uid = self.slot_uid[slot]
        if uid is None:
            return
        if tok == self.sampling.eos_id:
            self.completions.append(
                Completion(uid, self.slot_tokens[slot], "eos"))
            self.slot_uid[slot] = None
            return
        self.slot_tokens[slot].append(tok)
        self.slot_budget[slot] -= 1
        if update_last:
            self.last_tokens = self.last_tokens.at[slot].set(tok)
        if (self.slot_budget[slot] <= 0
                or len(self.slot_tokens[slot]) + slot_len
                >= self.max_len - 1):
            self.completions.append(
                Completion(uid, self.slot_tokens[slot], "length"))
            self.slot_uid[slot] = None

    def step(self) -> None:
        """One decode step over all active slots."""
        active_mask = np.asarray(
            [u is not None for u in self.slot_uid], bool)
        if not active_mask.any():
            return
        self.key, sub = jax.random.split(self.key)
        t0 = time.perf_counter()
        nxt, self.caches = self._decode_step(
            self.params, self.caches, self.last_tokens,
            jnp.asarray(active_mask), sub)
        nxt_host = np.asarray(nxt)      # host sync closes the timed span
        if self._plain_compiled:
            st = self._spec_stats
            st["plain_timed"] += 1
            st["plain_s"] += time.perf_counter() - t0
            st["plain_tok"] += int(active_mask.sum())
        else:
            self._plain_compiled = True     # first call paid the compile
        for slot in range(self.n_slots):
            self.slot_len[slot] += 1    # every slot's cache appended one
            if active_mask[slot]:
                self._host_emit(slot, int(nxt_host[slot]),
                                self.slot_len[slot])

    # ------------------------------------------------- multi-token stepping
    def _decode_multi_impl(self, params, caches, tokens, active, key,
                           n_steps: int):
        """``n_steps`` decode steps in ONE device program (lax.scan): slots
        that emit eos go inactive on-device, so a single host round-trip
        returns up to ``n_steps`` tokens per slot.  This amortizes the
        per-step host/device latency (the whole point of a serving engine on
        a remote-attached accelerator: ~tens of ms per round-trip on a
        tunneled link vs sub-ms per decoded token)."""
        def body(carry, k):
            caches, tokens, active = carry
            nxt, caches = self._decode_step_impl(
                params, caches, tokens, active, k)
            emitted = jnp.where(active, nxt, self.pad_id)
            still = active & (nxt != self.sampling.eos_id)
            tokens = jnp.where(active, nxt, tokens)
            return (caches, tokens, still), emitted

        keys = jax.random.split(key, n_steps)
        (caches, tokens, active), toks = jax.lax.scan(
            body, (caches, tokens, active), keys)
        return toks, caches, tokens   # toks: [n_steps, n_slots]

    def step_many(self, n: int) -> None:
        """Up to ``n`` decode steps per host round-trip.

        Slots finishing mid-scan are retired when the tokens come back (they
        decode masked garbage until the scan ends — the utilization cost of
        batching round-trips); refills happen on the next ``admit``.  ``n``
        is clamped so no active slot can overrun its cache."""
        active_mask = np.asarray(
            [u is not None for u in self.slot_uid], bool)
        if not active_mask.any():
            return
        # Only the cache-capacity clamp is required: a slot exhausting its
        # token budget mid-scan is retired by _host_emit and its remaining
        # scan tokens discarded, exactly like max_len retirement.  Clamping
        # to min(budgets) would degrade the whole batch to per-token
        # round-trips whenever one slot is nearly done.
        room = self.max_len - 1 - max(
            self.slot_len[i] for i in range(self.n_slots) if active_mask[i])
        n_steps = max(1, min(n, room))
        if n_steps not in self._decode_multi:
            self._decode_multi[n_steps] = jax.jit(functools.partial(
                self._decode_multi_impl, n_steps=n_steps))
        self.key, sub = jax.random.split(self.key)
        toks, self.caches, last = self._decode_multi[n_steps](
            self.params, self.caches, self.last_tokens,
            jnp.asarray(active_mask), sub)
        self.last_tokens = last
        toks_host = np.asarray(toks)
        for slot in range(self.n_slots):
            base = self.slot_len[slot]
            self.slot_len[slot] += n_steps
            if not active_mask[slot]:
                continue
            for i in range(n_steps):
                if self.slot_uid[slot] is None:
                    break         # retired mid-scan; rest is masked garbage
                self._host_emit(slot, int(toks_host[i, slot]),
                                base + i + 1, update_last=False)

    def run_many(self, n: int = 8) -> list[Completion]:
        """Drain the queue with ``n``-token device steps."""
        while self.has_work():
            self.admit()
            self.step_many(n)
        out, self.completions = self.completions, []
        return out

    # ------------------------------------------------- speculative stepping
    def _spec_step_impl(self, params, dparams, t_caches, d_caches,
                        tokens, active, key, n_draft: int):
        """One draft-verify round for every slot (inference/speculative.py's
        shared round): up to ``n_draft`` tokens per slot per host
        round-trip, with the draft model paying the extra forwards instead
        of the target."""
        from tpu_flash.inference.speculative import speculative_round

        emitted, m, g_m, t_caches, d_caches = speculative_round(
            self.model, params, self.draft_model, dparams, self.sampling,
            t_caches, d_caches, tokens, active, key, n_draft,
            self.pad_id)
        n_valid = jnp.where(active, m + 1, 0)
        new_tokens = jnp.where(active, g_m, tokens)
        return emitted, n_valid, t_caches, d_caches, new_tokens

    def step_speculative(self) -> None:
        """One speculative round over all active slots (requires a
        ``draft_model``); emits up to ``n_draft`` tokens per slot.

        The round width is clamped so no active slot's verification can
        overrun its cache (like ``step_many``'s clamp): the final rounds
        near capacity shrink instead of retiring early, so per-token
        retirement in ``_host_emit`` fires at exactly the same point as
        ``run()``'s."""
        if self.draft_model is None:
            raise ValueError("engine was built without a draft_model")
        # retire slots with no cache room for even a single-token round
        # (unreachable while _host_emit's length retirement holds; guard)
        for slot in range(self.n_slots):
            if (self.slot_uid[slot] is not None
                    and self.slot_len[slot] + 1 >= self.max_len):
                self.completions.append(Completion(
                    self.slot_uid[slot], self.slot_tokens[slot], "length"))
                self.slot_uid[slot] = None
        active_mask = np.asarray(
            [u is not None for u in self.slot_uid], bool)
        if not active_mask.any():
            return
        # KV writes this round land at positions len..len+W-1 (< max_len)
        room = self.max_len - max(
            self.slot_len[i] for i in range(self.n_slots) if active_mask[i])
        W = max(1, min(self.n_draft, room))
        if W not in self._spec_step:
            self._spec_step[W] = jax.jit(functools.partial(
                self._spec_step_impl, n_draft=W))
        self.key, sub = jax.random.split(self.key)
        t0 = time.perf_counter()
        emitted, n_valid, self.caches, self.draft_caches, last = \
            self._spec_step[W](self.params, self.draft_params, self.caches,
                               self.draft_caches, self.last_tokens,
                               jnp.asarray(active_mask), sub)
        self.last_tokens = last
        emitted_host = np.asarray(emitted)
        n_valid_host = np.asarray(n_valid)  # host sync closes timed span
        dt = time.perf_counter() - t0
        st = self._spec_stats
        n_active = int(active_mask.sum())
        n_emitted = int(n_valid_host[active_mask].sum())
        st["rounds"] += 1
        st["proposed"] += W * n_active
        st["emitted"] += n_emitted
        # each active slot emits (accepted + 1 corrected): the honest
        # acceptance fraction excludes the per-round bonus token
        st["accepted"] += n_emitted - n_active
        if W in self._spec_compiled:
            st["spec_timed"] += 1
            st["spec_s"] += dt
            st["spec_tok"] += n_emitted
        else:
            self._spec_compiled.add(W)      # first call paid the compile
        for slot in range(self.n_slots):
            if not active_mask[slot]:
                continue
            base = self.slot_len[slot]
            self.slot_len[slot] += int(n_valid_host[slot])
            for j in range(int(n_valid_host[slot])):
                if self.slot_uid[slot] is None:
                    break         # retired mid-round (eos); rest discarded
                self._host_emit(slot, int(emitted_host[slot, j]),
                                base + j + 1, update_last=False)

    def run_speculative(
            self, probe_rounds: int | None = 8) -> list[Completion]:
        """Drain the queue with speculative rounds, under an
        ACCEPTANCE-AWARE guard (VERDICT r4 #4).

        Greedy speculative decoding is output-invariant — verification
        emits exactly the tokens the target model alone would — so the
        engine can measure both modes on the live stream without changing
        any completion.  Probation alternates wall-timed speculative
        rounds and plain decode steps (each mode's first call, the
        compile, is excluded); once both sides hold ``probe_rounds``
        timed samples it compares measured tokens/second and commits to
        the winner for the rest of the drain.  The decision (with the
        measured rates and raw acceptance fraction) is recorded in
        ``self.spec_decision``.  A random/poorly-matched draft therefore
        costs ~probe_rounds slow rounds, not the whole run — the
        auto-fallback the round-4 serving table lacked (its speculative
        row measured pure overhead end-to-end, bench/RESULTS.md r4).

        ``probe_rounds=None`` disables the guard (always speculative).
        """
        if self.draft_model is None:
            raise ValueError("engine was built without a draft_model")
        while self.has_work():
            self.admit()
            st = self._spec_stats
            if probe_rounds is not None and self.spec_decision is None:
                if (st["spec_timed"] >= probe_rounds
                        and st["plain_timed"] >= probe_rounds):
                    spec_tps = st["spec_tok"] / max(st["spec_s"], 1e-12)
                    plain_tps = st["plain_tok"] / max(st["plain_s"], 1e-12)
                    self.spec_decision = dict(
                        mode=("speculative" if spec_tps >= plain_tps
                              else "plain"),
                        spec_tps=spec_tps, plain_tps=plain_tps,
                        acceptance=st["accepted"] / max(st["proposed"], 1))
                else:
                    # probation: alternate timed samples of each mode
                    if st["spec_timed"] <= st["plain_timed"]:
                        self.step_speculative()
                    else:
                        self.step()
                    continue
            if (self.spec_decision is None
                    or self.spec_decision["mode"] == "speculative"):
                self.step_speculative()
            else:
                self.step()
        out, self.completions = self.completions, []
        return out
