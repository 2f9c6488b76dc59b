#!/usr/bin/env python
"""Train the neural LTS (attention seq2seq) on CMUdict, on the TPU.

The reference reaches neural-LTS quality through g2p_en's pretrained
network (reference: src/text.py:35).  This trainer builds the same
capability TPU-native: a BiLSTM character encoder + Luong-attention
LSTM phoneme decoder (~3M params), trained with jax/optax on the chip
in minutes, exported as one fp16 npz for the numpy inference module
(tacotron2_tpu/text/lts_neural.py).

Holdout protocol: words with ``crc32(word) % 10 == 0`` are EXCLUDED
from training — identical to the graphone n-gram split — so the
held-out evaluation is a true OOV measurement.

    python tools/train_lts_neural.py [--epochs 30] [--batch 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tacotron2_tpu.text.lexicon import load_lexicon  # noqa: E402
from tacotron2_tpu.text.lts_neural import (  # noqa: E402
    BOS, EOS, MAX_PHONES, MAX_WORD_LEN, PAD, letter_ids)

L_EMB = 64
ENC_H = 256          # per direction
DEC_H = 512


def is_holdout(word: str) -> bool:
    return zlib.crc32(word.encode()) % 10 == 0


def build_data():
    lex = load_lexicon()
    phone_set = sorted({p for ph in lex.values() for p in ph})
    phone_id = {p: i + 3 for i, p in enumerate(phone_set)}   # 0/1/2 special
    rows = []
    hold = []
    for w, ph in sorted(lex.items()):
        ids = letter_ids(w)
        if ids is None or not 1 <= len(ids) <= MAX_WORD_LEN \
                or len(ph) > MAX_PHONES - 1:
            continue
        (hold if is_holdout(w) else rows).append((w, ids, ph))
    n = len(rows)
    letters = np.zeros((n, MAX_WORD_LEN), np.int32)
    targets = np.zeros((n, MAX_PHONES), np.int32)            # phones + EOS
    for i, (_, ids, ph) in enumerate(rows):
        letters[i, :len(ids)] = ids
        targets[i, :len(ph)] = [phone_id[p] for p in ph]
        targets[i, len(ph)] = EOS
    symbols = ["<pad>", "<s>", "</s>"] + phone_set
    return letters, targets, symbols, rows, hold


def init_params(key, n_phones: int):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(key, 12)

    def mat(k, shape):
        bound = 1.0 / np.sqrt(shape[0])
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return {
        "enc_emb": mat(ks[0], (27, L_EMB)),
        "enc_fwd_wi": mat(ks[1], (L_EMB, 4 * ENC_H)),
        "enc_fwd_wh": mat(ks[2], (ENC_H, 4 * ENC_H)),
        "enc_fwd_b": jnp.zeros((4 * ENC_H,)),
        "enc_bwd_wi": mat(ks[3], (L_EMB, 4 * ENC_H)),
        "enc_bwd_wh": mat(ks[4], (ENC_H, 4 * ENC_H)),
        "enc_bwd_b": jnp.zeros((4 * ENC_H,)),
        "dec_emb": mat(ks[5], (n_phones, L_EMB)),
        "dec_wi": mat(ks[6], (L_EMB + 2 * ENC_H, 4 * DEC_H)),
        "dec_wh": mat(ks[7], (DEC_H, 4 * DEC_H)),
        "dec_b": jnp.zeros((4 * DEC_H,)),
        "attn_w": mat(ks[8], (2 * ENC_H, DEC_H)),
        "out_w": mat(ks[9], (DEC_H + 2 * ENC_H, n_phones)),
        "out_b": jnp.zeros((n_phones,)),
    }


def make_fns(n_phones: int, dropout: float = 0.0,
             label_smooth: float = 0.0):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def lstm_step(wi, wh, b, x, h, c):
        g = x @ wi + h @ wh + b
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        return jax.nn.sigmoid(o) * jnp.tanh(c2), c2

    def encode(p, letters):
        xs = p["enc_emb"][letters]                     # (B, L, E)
        B = xs.shape[0]
        z = jnp.zeros((B, ENC_H))

        def fwd(carry, x):
            h, c = lstm_step(p["enc_fwd_wi"], p["enc_fwd_wh"],
                             p["enc_fwd_b"], x, *carry)
            return (h, c), h

        def bwd(carry, x):
            h, c = lstm_step(p["enc_bwd_wi"], p["enc_bwd_wh"],
                             p["enc_bwd_b"], x, *carry)
            return (h, c), h

        _, hf = lax.scan(fwd, (z, z), jnp.swapaxes(xs, 0, 1))
        _, hb = lax.scan(bwd, (z, z), jnp.swapaxes(xs, 0, 1), reverse=True)
        return jnp.concatenate([hf, hb], -1).swapaxes(0, 1)  # (B, L, 2H)

    def dec_step(p, enc, keys, lmask, prev_ids, h, c, ctx, drop=None):
        x = jnp.concatenate([p["dec_emb"][prev_ids], ctx], -1)
        h, c = lstm_step(p["dec_wi"], p["dec_wh"], p["dec_b"], x, h, c)
        # dropout on the projection view only; the carried state stays
        # clean (per-step recurrent-state dropout destabilizes training)
        hd = h * drop if drop is not None else h
        score = jnp.einsum("blh,bh->bl", keys, hd)
        score = jnp.where(lmask, score, -1e9)
        a = jax.nn.softmax(score, -1)
        ctx = jnp.einsum("bl,blh->bh", a, enc)
        logits = jnp.concatenate([hd, ctx], -1) @ p["out_w"] + p["out_b"]
        return h, c, ctx, logits

    def forward_tf(p, letters, targets, rng=None):
        """Teacher-forced logits (B, P, V).  ``rng`` enables decoder
        dropout (training only)."""
        enc = encode(p, letters)
        keys = enc @ p["attn_w"]
        lmask = letters > 0
        B = letters.shape[0]
        prev = jnp.concatenate(
            [jnp.full((B, 1), BOS, jnp.int32), targets[:, :-1]], 1)
        z = jnp.zeros((B, DEC_H))
        ctx0 = jnp.zeros((B, 2 * ENC_H))
        if rng is not None and dropout > 0.0:
            keep = 1.0 - dropout
            masks = (jax.random.bernoulli(
                rng, keep, (targets.shape[1], B, DEC_H)) / keep)
        else:
            masks = jnp.ones((targets.shape[1], B, DEC_H))

        def step(carry, xs):
            prev_t, m = xs
            h, c, ctx = carry
            h, c, ctx, logits = dec_step(p, enc, keys, lmask, prev_t,
                                         h, c, ctx, drop=m)
            return (h, c, ctx), logits

        _, logits = lax.scan(step, (z, z, ctx0),
                             (jnp.swapaxes(prev, 0, 1), masks))
        return jnp.swapaxes(logits, 0, 1)

    def loss_fn(p, letters, targets, rng):
        logits = forward_tf(p, letters, targets, rng)
        mask = targets != PAD
        lp = jax.nn.log_softmax(logits, -1)
        nll = -jnp.take_along_axis(lp, targets[..., None], -1)[..., 0]
        if label_smooth > 0.0:
            nll = ((1.0 - label_smooth) * nll
                   - label_smooth * lp.mean(-1))
        return (nll * mask).sum() / mask.sum()

    def greedy(p, letters):
        """Greedy decode (B, MAX_PHONES) of phone ids."""
        enc = encode(p, letters)
        keys = enc @ p["attn_w"]
        lmask = letters > 0
        B = letters.shape[0]
        z = jnp.zeros((B, DEC_H))
        ctx0 = jnp.zeros((B, 2 * ENC_H))
        prev0 = jnp.full((B,), BOS, jnp.int32)

        def step(carry, _):
            h, c, ctx, prev = carry
            h, c, ctx, logits = dec_step(p, enc, keys, lmask, prev,
                                         h, c, ctx)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (h, c, ctx, nxt), nxt

        _, out = lax.scan(step, (z, z, ctx0, prev0), None,
                          length=MAX_PHONES)
        return jnp.swapaxes(out, 0, 1)

    return loss_fn, greedy


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--eval-n", type=int, default=1500)
    ap.add_argument("--limit", type=int, default=0,
                    help="cap training words (smoke tests)")
    ap.add_argument("--dropout", type=float, default=0.25,
                    help="decoder projection-view dropout")
    ap.add_argument("--smooth", type=float, default=0.1,
                    help="label smoothing")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tacotron2_tpu", "text", "data", "lts_neural.npz"))
    a = ap.parse_args()

    from tacotron2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import optax

    letters, targets, symbols, rows, hold = build_data()
    if a.limit:
        letters, targets = letters[:a.limit], targets[:a.limit]
    n, V = len(letters), len(symbols)
    print(f"train words: {n}  holdout: {len(hold)}  phone vocab: {V}",
          flush=True)

    loss_fn, greedy = make_fns(V, dropout=a.dropout, label_smooth=a.smooth)
    params = init_params(jax.random.PRNGKey(a.seed), V)
    steps_per_epoch = n // a.batch
    total_steps = a.epochs * steps_per_epoch
    sched = optax.warmup_cosine_decay_schedule(
        0.0, a.lr, min(200, max(total_steps // 10, 1)), total_steps,
        a.lr * 0.02)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, lb, tb, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, lb, tb, rng)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    greedy_jit = jax.jit(greedy)

    # held-out eval batch (fixed): first eval-n alphabetic holdout words
    hl = np.zeros((a.eval_n, MAX_WORD_LEN), np.int32)
    htruth = []
    ev = 0
    for w, ids, ph in hold:
        if ev >= a.eval_n:
            break
        hl[ev, :len(ids)] = ids
        htruth.append(ph)
        ev += 1
    hl = hl[:ev]

    def heldout_acc(params):
        out = np.asarray(greedy_jit(params, jnp.asarray(hl)))
        ok = ok_ns = 0
        for i, truth in enumerate(htruth):
            seq = []
            for t in out[i]:
                if t == EOS:
                    break
                if t > EOS:
                    seq.append(symbols[t])
            if tuple(seq) == tuple(truth):
                ok += 1
            if tuple(s.rstrip("012") for s in seq) == \
                    tuple(s.rstrip("012") for s in truth):
                ok_ns += 1
        return ok / max(ev, 1), ok_ns / max(ev, 1)

    rng = np.random.default_rng(a.seed)
    lb_dev = jnp.asarray(letters)
    tb_dev = jnp.asarray(targets)
    t0 = time.time()
    for epoch in range(a.epochs):
        perm = rng.permutation(n)
        te = time.time()
        tot = 0.0
        for s in range(steps_per_epoch):
            idx = jnp.asarray(perm[s * a.batch:(s + 1) * a.batch])
            step_rng = jax.random.fold_in(
                jax.random.PRNGKey(a.seed + 1), epoch * steps_per_epoch + s)
            params, opt_state, loss = train_step(
                params, opt_state, lb_dev[idx], tb_dev[idx], step_rng)
            tot += float(loss)
        msg = (f"epoch {epoch + 1}/{a.epochs}: loss "
               f"{tot / steps_per_epoch:.4f} ({time.time() - te:.1f}s)")
        if (epoch + 1) % a.eval_every == 0 or epoch + 1 == a.epochs:
            acc, acc_ns = heldout_acc(params)
            msg += (f"  heldout greedy word acc {acc:.4f} "
                    f"(stress-blind {acc_ns:.4f})")
        print(msg, flush=True)

    print(f"training done in {time.time() - t0:.0f}s", flush=True)
    out = {k: np.asarray(v, np.float16) for k, v in params.items()}
    out["phone_symbols"] = np.array(symbols)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    np.savez_compressed(a.out, **out)
    print(f"model written: {a.out} "
          f"({os.path.getsize(a.out) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
