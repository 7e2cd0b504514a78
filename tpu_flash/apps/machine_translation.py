"""End-to-end machine-translation training & evaluation CLI.

The analog of project/run_machine_translation.py in the reference: dataset ->
ByteLevelBPE tokenizer -> packed src/tgt batches -> decoder-only LM trained
with masked MLE -> greedy generation -> BLEU.  TPU-native differences:

  * one jitted train step (forward+backward+Adam in a single XLA program) —
    the reference crosses the host/device boundary per tensor op;
  * static ``model_max_length`` shapes so the step compiles once;
  * batched KV-cache generation (the reference re-runs the full prefix per
    token per example);
  * per-phase timing (fwd/bwd/opt) and tokens/sec reporting preserved
    (run_machine_translation.py:196-220), measured with proper device sync.

Run:  python -m tpu_flash.apps.machine_translation --n-epochs 1
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash import nn
from tpu_flash.data import mt
from tpu_flash.inference import (SamplingConfig, beam_generate,
                                 generate)


def make_loss_fn(model, chunked_vocab: int = 0, ctx=None):
    def loss_fn(params, batch, key=None, training=False):
        """Masked MLE, averaged over all positions — the reference's exact
        semantics (loss * weights then mean over every position,
        run_machine_translation.py:157-181).  Packed batches carry a
        ``loss_norm`` divisor of examples_per_step * L so the loss scale
        (and gradient magnitude) matches the equivalent unpacked batch —
        dividing by the smaller packed row count would inflate both by the
        compression ratio and make runs incomparable.

        ``chunked_vocab`` > 0 fuses lm_head + cross-entropy over that many
        vocab chunks: the [B, L, V] logits tensor is never materialized.
        With an active parallel context whose model axis is sharded this
        is the Megatron-style vocab-parallel loss (the vocab-sharded
        lm_head never gathers); otherwise it degrades to the single-device
        chunked form (vocab_parallel_softmax_loss handles both)."""
        out = model(params, batch["input_ids"],
                    segment_ids=batch.get("segment_ids"),
                    positions=batch.get("positions"),
                    key=key, training=training,
                    return_hidden=chunked_vocab > 0)
        if chunked_vocab > 0:
            from tpu_flash import parallel
            lm = params["lm_head"]
            losses = parallel.vocab_parallel_softmax_loss(
                out, lm["weight"], lm.get("bias"), batch["labels"],
                n_chunks=chunked_vocab, ctx=ctx)
        else:
            losses = nn.functional.softmax_loss(out, batch["labels"])
        weighted = losses * batch["label_token_weights"]
        if "loss_norm" in batch:
            return jnp.sum(weighted) / batch["loss_norm"]
        # mean written as sum/size: identical math, but the fused
        # jnp.mean-form reduce in this program reproducibly CRASHES the
        # TPU worker at compile on the 2026-08 pool toolchain (isolated
        # in /tmp/rmean.log vs /tmp/rs2.log — same step, only the mean
        # changed); the sum form compiles fine.
        return jnp.sum(weighted) / weighted.size
    return loss_fn


def make_train_step(model, opt, chunked_vocab: int = 0,
                    accum_steps: int = 1):
    loss_fn = make_loss_fn(model, chunked_vocab=chunked_vocab)

    if accum_steps > 1:
        def micro_loss(params, micro, training=True):
            micro = dict(micro)
            return loss_fn(params, micro, key=micro.pop("__key__"),
                           training=training)

        compute = nn.accumulate_gradients(micro_loss, accum_steps)

        @jax.jit
        def train_step(params, opt_state, batch, key):
            A = accum_steps

            def split(k, v):
                if getattr(v, "ndim", 0) == 0:      # loss_norm etc.
                    # each microbatch normalizes by 1/A of the full-batch
                    # divisor; the 1/A average of micro losses then equals
                    # the full-batch loss exactly
                    return jnp.broadcast_to(
                        jnp.asarray(v, jnp.float32) / A, (A,))
                return v.reshape(A, v.shape[0] // A, *v.shape[1:])

            micro = {k: split(k, v) for k, v in batch.items()}
            # distinct dropout keys per microbatch (scanned with the batch);
            # reusing one key would give every microbatch the same mask
            micro["__key__"] = jax.random.split(key, A)
            loss, grads = compute(params, micro, True)
            params, opt_state = opt.update(grads, opt_state, params)
            return params, opt_state, loss

        return train_step

    @jax.jit
    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, batch, key=key, training=True)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    return train_step


def _place_batch(ctx, batch):
    """Device placement policy for one host batch: with a mesh, batch rows
    go over the data axis and scalars replicate (parallel.put_batch);
    without one, plain device transfer."""
    if ctx is not None:
        from tpu_flash import parallel
        return parallel.put_batch(ctx, batch)
    return {k: jnp.asarray(v) for k, v in batch.items()}


def train_epoch(model, opt, params, opt_state, examples, collate_fn,
                batch_size, key, *, n_samples=None, max_iters=None,
                log_every=10, native_loader=None, metrics=None,
                chunked_vocab: int = 0, ctx=None, train_step=None):
    """One training epoch with fwd+bwd+opt fused in a single jitted step;
    reports tokens/sec like the reference's tqdm postfix.

    When ``native_loader`` is given (data/native_loader.NativeBatchLoader),
    batches come from the C++ worker-pool ring buffer — host packing fully
    overlaps device steps.

    ``ctx``/``train_step``: multi-chip SPMD training — ``train_step`` is a
    prebuilt sharded step (parallel.make_sharded_train_step or the ZeRO-1
    variant) and batches are placed onto the mesh with parallel.put_batch
    (batch rows over the data axis, scalars replicated)."""
    if train_step is None:
        if ctx is not None:
            # A mesh without a prebuilt step still needs the sharded step:
            # the Pallas ops consult the active parallel context at trace
            # time, and a plain jit would emit unpartitionable pallas_calls
            # against TP-sharded params.
            from tpu_flash import parallel
            train_step = parallel.make_sharded_train_step(
                ctx, model, opt,
                make_loss_fn(model, chunked_vocab=chunked_vocab, ctx=ctx))
        else:
            train_step = make_train_step(model, opt,
                                         chunked_vocab=chunked_vocab)
    # Host-side shuffle seed from the key's raw data: a transfer, not a
    # compile — the previous eager jax.random.randint was this loop's only
    # eagerly-compiled op, and one slow remote compile of it stalled epoch
    # startup by minutes on a cold compile cache.
    rng = np.random.default_rng(
        np.asarray(jax.random.key_data(key)).ravel().tolist())
    order = rng.permutation(len(examples))
    if n_samples:
        order = order[:n_samples]

    # Async stepping: the host syncs (float(loss)) only at log boundaries,
    # so up to log_every device steps queue back-to-back and host-side batch
    # prep overlaps device compute.  Over a tunneled link each sync costs
    # ~40 ms — syncing every step made that a per-step tax (the reference
    # syncs every step for its tqdm postfix).  Per-step times are the
    # marginal window time / steps; the first window (compile) is excluded
    # from step_times like the old `it > 0` rule.
    losses_dev = []
    step_times = []
    step_tokens = 0
    n_batches = len(order) // batch_size
    if max_iters is not None:
        n_batches = min(n_batches, max_iters)
    mark_t = time.perf_counter()
    mark_it = 0
    for it in range(n_batches):
        if native_loader is not None:
            batch = native_loader.next()
        else:
            idx = order[it * batch_size:(it + 1) * batch_size]
            batch = collate_fn([examples[i] for i in idx])
        if "segment_ids" in batch and "loss_norm" not in batch:
            batch["loss_norm"] = np.float32(
                batch_size * batch["input_ids"].shape[1])
        batch = _place_batch(ctx, batch)
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, batch, sub)
        losses_dev.append(loss)
        step_tokens = int(batch["input_ids"].size)
        if it % log_every == 0 or it == n_batches - 1:
            loss_h = float(loss)                 # host sync closes window
            now = time.perf_counter()
            n_win = it - mark_it + 1
            dt = (now - mark_t) / n_win
            if mark_it > 0:
                step_times.extend([dt] * n_win)
            mark_t, mark_it = now, it + 1
            toks = batch["input_ids"].size
            print(f"  it {it}/{n_batches}  loss {loss_h:.4f}  "
                  f"tokens/sec {toks / dt:,.0f}")
            if metrics is not None:
                metrics.log(step=it, loss=loss_h,
                            step_ms=round(dt * 1e3, 2),
                            tokens_per_sec=round(toks / dt))
    losses = [float(l) for l in losses_dev]
    return params, opt_state, losses, step_times, step_tokens


def evaluate_loss(model, params, examples, collate_fn, batch_size,
                  chunked_vocab: int = 0, ctx=None):
    base_fn = make_loss_fn(model, chunked_vocab=chunked_vocab, ctx=ctx)
    if ctx is not None:
        # Trace under the active parallel context like the sharded train
        # step does (parallel/train.py make_sharded_train_step): the Pallas
        # attention ops pick their shard_map wrapping from it, so a bare
        # trace against TP-sharded params would not partition.
        from tpu_flash.parallel.context import parallel_context

        def ctx_fn(params, batch):
            with parallel_context(ctx):
                return base_fn(params, batch)
        loss_fn = jax.jit(ctx_fn)
    else:
        loss_fn = jax.jit(base_fn)
    losses = []
    for i in range(0, len(examples) - batch_size + 1, batch_size):
        batch = collate_fn(examples[i:i + batch_size])
        batch = _place_batch(ctx, batch)
        losses.append(float(loss_fn(params, batch)))
    return float(np.mean(losses)) if losses else float("nan")


def generate_translations(model, params, examples, src_key, tgt_key,
                          tokenizer, model_max_length, *, batch_size=16,
                          max_new_tokens=None, kv_quant="none",
                          beam_size=1, ctx=None):
    """Batched KV-cache decode for the test set (greedy, or beam search for
    ``beam_size > 1``); returns detokenized hypotheses aligned with
    ``examples``.

    ``ctx``: decode against mesh-sharded params — traces under the parallel
    context so the decode attention picks its tensor-parallel shard_map
    wrapping (same requirement as evaluate_loss; indivisible batch/head
    shapes fall back to the GSPMD-partitioned graph inside ops/attention)."""
    if ctx is not None:
        from tpu_flash.parallel.context import parallel_context
        with parallel_context(ctx):
            return generate_translations(
                model, params, examples, src_key, tgt_key, tokenizer,
                model_max_length, batch_size=batch_size,
                max_new_tokens=max_new_tokens, kv_quant=kv_quant,
                beam_size=beam_size)
    eos_tgt = tokenizer.vocab[f"<eos_{tgt_key}>"]
    pad_id = tokenizer.vocab["<pad>"]
    max_new = max_new_tokens or model_max_length
    sampling = SamplingConfig(max_new_tokens=max_new, temperature=0.0,
                              eos_id=eos_tgt)

    hyps = []
    for i in range(0, len(examples), batch_size):
        chunk = examples[i:i + batch_size]
        prompts = [
            tokenizer(f"{ex[src_key]}<eos_{src_key}>")["input_ids"]
            for ex in chunk
        ]
        lengths = np.asarray([len(p) for p in prompts], np.int32)
        Lp = int(lengths.max())
        padded = np.full((len(chunk), Lp), pad_id, np.int32)
        for j, p in enumerate(prompts):
            padded[j, :len(p)] = p
        if beam_size > 1:
            toks, _ = beam_generate(
                model, params, jnp.asarray(padded), jnp.asarray(lengths),
                beam_size=beam_size, max_new_tokens=max_new,
                max_len=Lp + max_new, eos_id=eos_tgt, pad_id=pad_id,
                kv_quant=kv_quant)
        else:
            toks, _ = generate(
                model, params, jnp.asarray(padded), jnp.asarray(lengths),
                sampling, max_len=Lp + max_new, pad_id=pad_id,
                kv_quant=kv_quant)
        toks = np.asarray(toks)
        for j in range(len(chunk)):
            ids = [int(t) for t in toks[j] if int(t) != pad_id
                   and int(t) != eos_tgt]
            hyps.append(tokenizer.decode(ids))
    return hyps


def evaluate_bleu(examples, gen_sents, tgt_key):
    """sacrebleu corpus BLEU (run_machine_translation.py:304-320)."""
    from sacrebleu.metrics import BLEU

    return {
        "bleu": BLEU().corpus_score(
            hypotheses=gen_sents,
            references=[[ex[tgt_key] for ex in examples]]).score
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="bbaaaa/iwslt14-de-en")
    p.add_argument("--synthetic", action="store_true",
                   help="force the offline synthetic translation task")
    p.add_argument("--model-max-length", type=int, default=40)
    p.add_argument("--n-vocab", type=int, default=10_000)
    p.add_argument("--n-embd", type=int, default=256)
    p.add_argument("--n-head", type=int, default=8)
    p.add_argument("--n-layer", type=int, default=4)
    p.add_argument("--p-dropout", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=0.02)
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = reference's dynamic rule (128*40+L)//L")
    p.add_argument("--n-epochs", type=int, default=1)
    p.add_argument("--max-iters-per-epoch", type=int, default=None)
    p.add_argument("--samples-per-epoch", type=int, default=20_000)
    p.add_argument("--attention-kind", default="flash",
                   choices=["flash", "fused", "naive", "auto"])
    p.add_argument("--use-fused-kernel", action="store_true")
    p.add_argument("--mask-padding", action="store_true",
                   help="zero loss weights on pad positions (correct MLE; "
                        "default False reproduces the reference, which "
                        "counts pads at weight 1)")
    p.add_argument("--pack", action="store_true",
                   help="sequence-packed training: fill each row with "
                        "multiple examples under segment-id attention "
                        "masking (no pad-token FLOPs)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--mixed-precision", action="store_true",
                   help="fp32 master weights in the optimizer state while "
                        "the model computes in --dtype (use with "
                        "--dtype bfloat16: bf16 MXU speed, fp32-Adam "
                        "trajectory)")
    p.add_argument("--workdir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip-bleu", action="store_true")
    p.add_argument("--beam-size", type=int, default=1,
                   help="beam search width for BLEU generation (1 = greedy)")
    p.add_argument("--kv-quant", default="none",
                   choices=("none", "int8", "fp8"),
                   help="KV-cache quantization for BLEU generation "
                        "(BASELINE config 4: MT with FP8 KV)")
    p.add_argument("--kv-quant-train", default="none",
                   choices=("none", "int8", "fp8",
                            "int8_channel", "fp8_channel"),
                   help="quantized-KV TRAINING attention: K/V quantized "
                        "per-position (int8/fp8) or per-channel "
                        "(*_channel — the scale-free kernel form), "
                        "forward and backward both run on the codes "
                        "(DecoderConfig.kv_quant; BASELINE measured "
                        "config 4 training leg)")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ background packing loader")
    p.add_argument("--chunked-loss", type=int, default=0, metavar="N",
                   help="fuse lm_head+cross-entropy over N vocab chunks "
                        "(no [B,L,V] logits tensor); 0 = off")
    p.add_argument("--accum-steps", type=int, default=1, metavar="A",
                   help="gradient accumulation: split each batch into A "
                        "microbatches scanned with one optimizer step "
                        "(activation memory of one microbatch); "
                        "single-device path only")
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="save a checkpoint every N epochs (0 disables)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in the workdir")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler device trace of epoch 0 "
                        "into <workdir>/profile (open in XProf/TensorBoard "
                        "for per-kernel timelines and HBM/roofline "
                        "counters)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh size (batch rows sharded)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (Megatron layouts; "
                        "composes with --chunked-loss into the "
                        "vocab-parallel fused loss)")
    p.add_argument("--zero1", action="store_true",
                   help="shard Adam moments over the data axis (ZeRO-1)")
    p.add_argument("--sequence-parallel", action="store_true",
                   help="Megatron-SP: shard LN/dropout/residual activations "
                        "over the tp axis along the sequence dim (needs "
                        "--tp > 1 to have any effect)")
    p.add_argument("--dcn-data", type=int, default=1, metavar="H",
                   help="multi-host: number of DCN granules (hosts/slices); "
                        "joins the job via jax.distributed.initialize and "
                        "builds the hybrid mesh (--tp on ICI within each "
                        "host, data = H x --dp with the host axis slowest). "
                        "Run the same command once per host.")
    args = p.parse_args(argv)

    if args.dcn_data > 1 and not os.environ.get("TPU_FLASH_PLATFORM"):
        # Join the multi-host job (auto-detected on TPU pods).  Under the
        # single-process CPU emulation (TPU_FLASH_PLATFORM=cpu + virtual
        # devices) there is no coordinator — make_mesh emulates the DCN
        # granules with contiguous device blocks instead (context.py).
        from tpu_flash import parallel
        parallel.initialize_distributed()

    L = args.model_max_length
    batch_size = args.batch_size or (128 * 40 + L) // L  # reference rule

    ctx = None
    if args.dp * args.tp * args.dcn_data > 1 or args.zero1:
        from tpu_flash import parallel
        n_dev = args.dp * args.tp * args.dcn_data
        if n_dev > len(jax.devices()):
            raise SystemExit(
                f"--dp {args.dp} x --tp {args.tp} needs {n_dev} devices, "
                f"have {len(jax.devices())}")
        for name, val in (("n_vocab", args.n_vocab), ("n_embd", args.n_embd),
                          ("n_head", args.n_head)):
            if val % args.tp:
                raise SystemExit(
                    f"--tp {args.tp} requires --{name.replace('_', '-')} "
                    f"divisible by tp (got {val}); Megatron layouts shard "
                    f"these dims over the model axis")
        ctx = parallel.make_mesh(data=args.dp, model=args.tp,
                                 devices=jax.devices()[:n_dev],
                                 dcn_data=args.dcn_data)
        dp_total = args.dp * args.dcn_data
        if batch_size % dp_total:
            batch_size = -(-batch_size // dp_total) * dp_total
            print(json.dumps({"batch_size_rounded_to_dp": batch_size}))
    if args.accum_steps > 1:
        if ctx is not None:
            raise SystemExit("--accum-steps composes with the single-device "
                             "step only (use a larger --dp instead of "
                             "accumulating under a mesh)")
        if args.pack:
            raise SystemExit("--accum-steps with --pack is unsupported: "
                             "packed rows-per-step vary, so microbatch "
                             "splits would be ragged")
        if batch_size % args.accum_steps:
            batch_size = -(-batch_size // args.accum_steps) * args.accum_steps
            print(json.dumps({"batch_size_rounded_to_accum": batch_size}))
    workdir = args.workdir or f"workdir_vocab{args.n_vocab}_len{L}"
    os.makedirs(workdir, exist_ok=True)

    dataset, src_key, tgt_key = mt.get_dataset(
        args.dataset, L, synthetic=args.synthetic or None)
    print(json.dumps({"data_size": {s: len(d) for s, d in dataset.items()}}))
    tokenizer = mt.get_tokenizer(
        dataset["train"], args.n_vocab, src_key, tgt_key, workdir)
    if len(tokenizer) > args.n_vocab:
        # Byte-level BPE can't go below its 256-byte base alphabet (+3
        # specials): token ids would exceed the embedding/lm_head size and
        # the loss silently NaNs on out-of-range labels.
        raise SystemExit(
            f"--n-vocab {args.n_vocab} is smaller than the trained "
            f"tokenizer's vocab ({len(tokenizer)}); byte-level BPE needs "
            f"at least 259")

    def collate_fn(examples):
        return mt.collate_batch(examples, src_key, tgt_key, tokenizer, L,
                                mask_padding=args.mask_padding)

    train_collate_fn = collate_fn
    if args.pack:
        # Fix the packed row count once so the jitted train step compiles
        # exactly once.  Probe SHUFFLED batches (the corpus head is not
        # length-representative) and add one margin row; residual overflow
        # examples are dropped and counted (logged per epoch).
        prng = np.random.default_rng(args.seed)
        need = 1
        for _ in range(5):
            idx = prng.choice(len(dataset["train"]),
                              min(batch_size, len(dataset["train"])),
                              replace=False)
            probe = mt.collate_packed(
                [dataset["train"][i] for i in idx], src_key, tgt_key,
                tokenizer, L)
            need = max(need, probe["input_ids"].shape[0])
        pack_rows = need + 1
        if ctx is not None and pack_rows % args.dp:
            pack_rows = -(-pack_rows // args.dp) * args.dp  # data-shardable
        print(json.dumps({"pack_rows": pack_rows,
                          "examples_per_step": batch_size}))
        drop_counter: list = []

        def train_collate_fn(examples):
            return mt.collate_packed(examples, src_key, tgt_key, tokenizer,
                                     L, fixed_rows=pack_rows,
                                     drop_counter=drop_counter)

        train_collate_fn.drop_counter = drop_counter

    cfg = nn.DecoderConfig(
        n_vocab=args.n_vocab, n_embd=args.n_embd, n_head=args.n_head,
        n_positions=L, n_layer=args.n_layer, p_dropout=args.p_dropout,
        attention_kind=args.attention_kind,
        use_fused_kernel=args.use_fused_kernel,
        sequence_parallel=args.sequence_parallel,
        kv_quant=args.kv_quant_train,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    model = nn.DecoderLM(cfg)
    key = jax.random.key(args.seed)
    key, pkey = jax.random.split(key)
    params = model.init(pkey)
    print(f"model parameters: {nn.num_parameters(params):,}")

    opt = nn.adam(lr=args.lr)
    if args.mixed_precision:
        opt = nn.mixed_precision(opt)
    opt_state = opt.init(params)

    from tpu_flash.utils import restore_checkpoint, save_checkpoint

    ckpt_dir = os.path.join(workdir, "checkpoints")
    start_epoch = 0
    if args.resume:
        try:
            tree, step, meta = restore_checkpoint(ckpt_dir)
            params, opt_state = tree["params"], tree["opt_state"]
            start_epoch = step + 1
            print(json.dumps({"resumed_from_epoch": step}))
        except FileNotFoundError:
            print(json.dumps({"resume": "no checkpoint found, cold start"}))

    if ctx is not None:
        # Place (possibly resumed) params in the Megatron TP layout and the
        # optimizer state alongside them — ZeRO-1 additionally shards every
        # param-congruent state array over the data axis.  device_put against
        # the sharding template preserves restored values exactly.
        from tpu_flash import parallel
        from tpu_flash.parallel.zero import state_shardings

        params, specs = parallel.shard_params(ctx, model, params)
        sspecs = (parallel.zero1_specs(ctx, params, specs) if args.zero1
                  else specs)
        state_sh = state_shardings(ctx, opt, params, sspecs)
        # Restored checkpoints rebuild namedtuple nodes as fresh classes
        # (checkpoint.py _rebuild), so the treedefs differ from the live
        # optimizer's; zip leaves in order and unflatten with the template
        # treedef — this also restores the real state class.
        sh_leaves, sh_def = jax.tree.flatten(state_sh)
        v_leaves = jax.tree.leaves(opt_state)
        assert len(sh_leaves) == len(v_leaves), \
            (len(sh_leaves), len(v_leaves))
        opt_state = jax.tree.unflatten(sh_def, [
            jax.device_put(jnp.asarray(v), sh)
            for sh, v in zip(sh_leaves, v_leaves)])

    native_loader = None
    if args.native_loader:
        from tpu_flash.data import native_loader as nl

        try:
            flats = nl.tokenize_corpus(
                dataset["train"], src_key, tgt_key, tokenizer)
            native_loader = nl.NativeBatchLoader(
                *flats, max_len=L, pad_id=tokenizer.vocab["<pad>"],
                batch_size=batch_size, seed=args.seed, n_threads=2,
                packed=args.pack,
                fixed_rows=pack_rows if args.pack else 0)
            print(json.dumps({"native_loader": "enabled",
                              "packed": args.pack}))
        except nl.NativeUnavailable as e:
            print(json.dumps({"native_loader": f"unavailable: {e}"}))

    from tpu_flash.utils.metrics import MetricsLogger

    metrics = MetricsLogger(os.path.join(workdir, "metrics.jsonl"),
                            run={"event_args": vars(args)})
    from tpu_flash.utils import AsyncCheckpointer

    ckpt = AsyncCheckpointer()
    try:
        _train_loop(args, model, opt, params, opt_state, dataset,
                    train_collate_fn, collate_fn,
                    batch_size, key, start_epoch, native_loader, metrics,
                    ckpt_dir, tokenizer, src_key, tgt_key, L, ctx=ctx,
                    ckpt=ckpt)
    finally:
        # flush the in-flight async checkpoint write before exiting (also
        # surfaces any background write error)
        ckpt.close()
        metrics.close()


def _train_loop(args, model, opt, params, opt_state, dataset,
                train_collate_fn, collate_fn,
                batch_size, key, start_epoch, native_loader, metrics,
                ckpt_dir, tokenizer, src_key, tgt_key, L, ctx=None,
                ckpt=None):
    if ckpt is None:
        from tpu_flash.utils import AsyncCheckpointer
        ckpt = AsyncCheckpointer()
    train_step = None
    if ctx is not None:
        from tpu_flash import parallel
        loss_fn = make_loss_fn(model, chunked_vocab=args.chunked_loss,
                               ctx=ctx)
        make_step = (parallel.make_zero1_train_step if args.zero1
                     else parallel.make_sharded_train_step)
        train_step = make_step(ctx, model, opt, loss_fn)
    elif getattr(args, "accum_steps", 1) > 1:
        train_step = make_train_step(model, opt,
                                     chunked_vocab=args.chunked_loss,
                                     accum_steps=args.accum_steps)

    for epoch in range(start_epoch, args.n_epochs):
        key, ekey = jax.random.split(key)
        profiling = (getattr(args, "profile", False)
                     and epoch == start_epoch)
        if profiling:
            from tpu_flash.utils.profiling import trace
            trace_cm = trace(os.path.join(os.path.dirname(ckpt_dir),
                                          "profile"))
            trace_cm.__enter__()
            print(json.dumps({"profile": "tracing epoch "
                                         f"{epoch} -> workdir/profile"}))
        t0 = time.perf_counter()
        try:
            params, opt_state, losses, step_times, step_tokens = train_epoch(
                model, opt, params, opt_state, dataset["train"],
                train_collate_fn,
                batch_size, ekey, n_samples=args.samples_per_epoch,
                max_iters=args.max_iters_per_epoch,
                native_loader=native_loader,
                metrics=metrics, chunked_vocab=args.chunked_loss,
                ctx=ctx, train_step=train_step)
        finally:
            if profiling:
                trace_cm.__exit__(None, None, None)
        epoch_time = time.perf_counter() - t0
        val_loss = evaluate_loss(model, params, dataset["validation"],
                                 collate_fn, batch_size,
                                 chunked_vocab=args.chunked_loss, ctx=ctx)
        mean_step = float(np.mean(step_times)) if step_times else float("nan")
        epoch_rec = {
            "epoch": epoch,
            "train_loss": float(np.mean(losses)),
            "validation_loss": val_loss,
            "epoch_time_s": round(epoch_time, 2),
            "mean_step_ms": round(mean_step * 1e3, 2),
            # device-tokens basis: rows * L actually stepped (matches the
            # per-iteration logs; under --pack this is the PACKED row count,
            # not batch_size — examples/sec is step_examples/mean_step)
            "tokens_per_sec": round(step_tokens / mean_step)
            if step_times else None,
            "examples_per_sec": round(batch_size / mean_step)
            if step_times else None,
        }
        drops = getattr(train_collate_fn, "drop_counter", None)
        if drops is not None:
            epoch_rec["packed_dropped_examples"] = int(sum(drops))
            drops.clear()
        if native_loader is not None and getattr(native_loader, "packed",
                                                 False):
            epoch_rec["packed_dropped_examples"] = native_loader.dropped()
        print(json.dumps(epoch_rec))
        metrics.log(step=epoch, event="epoch", **epoch_rec)

        if args.checkpoint_every and (epoch + 1) % args.checkpoint_every == 0:
            # async: serialization/IO overlaps the next epoch (BLEU eval,
            # training); only the D2H snapshot happens here
            ckpt.save(ckpt_dir, epoch,
                      {"params": params, "opt_state": opt_state},
                      metadata={"lr": args.lr, "config": vars(args)})
            print(json.dumps({"checkpoint": f"{ckpt_dir}/step_{epoch}",
                              "async": True}))

        if not args.skip_bleu:
            hyps = generate_translations(
                model, params, dataset["test"], src_key, tgt_key, tokenizer,
                L, kv_quant=args.kv_quant, beam_size=args.beam_size,
                ctx=ctx)
            scores = evaluate_bleu(dataset["test"], hyps, tgt_key)
            print(json.dumps({"epoch": epoch, **scores}))
            metrics.log(step=epoch, event="bleu", **scores)
            for ex, hyp in list(zip(dataset["test"], hyps))[:3]:
                print(json.dumps({"src": ex[src_key], "ref": ex[tgt_key],
                                  "hyp": hyp}))
    return params


if __name__ == "__main__":
    main()
