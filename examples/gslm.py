#!/usr/bin/env python
"""GSLM-style spoken generation: speech prompt -> units -> unit language
model continuation -> unit vocoder -> speech.

TPU-native equivalent of the textlesslib GSLM example
(/root/reference/unitspeech/textlesslib/examples/gslm/{sample,sampler}.py):
the reference samples continuations from a pretrained fairseq unit LM and
vocodes them with Tacotron2+WaveGlow. This demo keeps the same pipeline
shape with in-repo components end to end: a small causal-transformer unit
LM (flax), one jitted optax training step, temperature sampling as a
single lax.scan over a fixed-length token buffer (no Python generation
loop), and the TacotronVocoder glue for units -> waveform.

This demo trains the ULM for a minute on synthetic unit streams from the
tiny random SSL stack, then continues a held-out prompt. For real
artifacts, build the encoder/vocoder with
examples/resynthesis.build_checkpoint_stack and fit `train_ulm` on units
extracted from your corpus — the sampling/vocoding calls are identical.

Run: python examples/gslm.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU unless the caller EXPLICITLY exported JAX_PLATFORMS=tpu (probing the
# default backend would contend for the single tunneled chip).
if os.environ.get("JAX_PLATFORMS", "").lower() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
import optax


class UnitLM(nn.Module):
    """Causal transformer LM over discrete units (BOS = vocab_size)."""

    vocab_size: int
    d_model: int = 64
    n_heads: int = 2
    n_layers: int = 2
    ffn: int = 128

    @nn.compact
    def __call__(self, tokens):
        b, t = tokens.shape
        x = nn.Embed(self.vocab_size + 1, self.d_model)(tokens)
        x = x + self.param(
            "pos", nn.initializers.normal(0.02), (1, 2048, self.d_model)
        )[:, :t]
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        for _ in range(self.n_layers):
            h = nn.LayerNorm()(x)
            h = nn.SelfAttention(num_heads=self.n_heads,
                                 qkv_features=self.d_model)(h, mask=causal)
            x = x + h
            h = nn.LayerNorm()(x)
            x = x + nn.Dense(self.d_model)(nn.relu(nn.Dense(self.ffn)(h)))
        return nn.Dense(self.vocab_size)(nn.LayerNorm()(x))  # (B, T, V)


def train_ulm(streams, vocab_size, steps=120, seq_len=64, batch=16,
              lr=3e-3, seed=0, d_model=64):
    """Fit the unit LM on a list of 1-D unit arrays with next-token CE.
    Returns (lm, params, final_loss)."""
    lm = UnitLM(vocab_size=vocab_size, d_model=d_model)
    flat = np.concatenate([np.asarray(s, np.int32) for s in streams])
    params = lm.init(jax.random.PRNGKey(seed),
                     jnp.zeros((1, seq_len), jnp.int32))
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch_tokens):
        # input: BOS + tokens[:-1]; target: tokens
        inp = jnp.concatenate(
            [jnp.full((batch_tokens.shape[0], 1), vocab_size, jnp.int32),
             batch_tokens[:, :-1]], axis=1,
        )

        def loss_fn(p):
            logits = lm.apply(p, inp)
            logp = jax.nn.log_softmax(logits)
            ll = jnp.take_along_axis(
                logp, batch_tokens[..., None], axis=-1
            )[..., 0]
            return -ll.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    rng = np.random.default_rng(seed)
    loss = None
    for _ in range(steps):
        starts = rng.integers(0, max(len(flat) - seq_len, 1), batch)
        toks = np.stack([flat[s: s + seq_len] for s in starts])
        params, opt, loss = step(params, opt, jnp.asarray(toks))
    return lm, params, float(loss)


def sample_continuation(lm, params, prefix, n_new, temperature=0.8, seed=0):
    """Temperature-sample `n_new` units after `prefix`, as ONE lax.scan
    over a fixed-length buffer (the reference loops in fairseq's
    generator; here generation is a single compiled program)."""
    prefix = np.asarray(prefix, np.int32)
    total = len(prefix) + n_new
    buf = jnp.zeros((total + 1,), jnp.int32).at[0].set(lm.vocab_size)
    buf = buf.at[1: 1 + len(prefix)].set(prefix)

    @jax.jit
    def run(params, buf, key):
        def body(carry, i):
            buf, key = carry
            logits = lm.apply(params, buf[None, :-1])[0]  # (total, V)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(
                sub, logits[i - 1] / jnp.maximum(temperature, 1e-4)
            )
            # write only in the generation region (i >= len(prefix)+1... the
            # scan covers exactly that region, so always write)
            return (buf.at[i].set(nxt.astype(jnp.int32)), key), nxt

        idx = jnp.arange(1 + len(prefix), total + 1)
        (buf, _), _ = jax.lax.scan(body, (buf, key), idx)
        return buf

    out = np.asarray(run(params, buf, jax.random.PRNGKey(seed)))
    return out[1 + len(prefix):]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", default=None, help="prompt wav")
    ap.add_argument("--output", default="gslm_continuation.wav")
    ap.add_argument("--seconds", type=float, default=2.0,
                    help="speech to generate after the prompt")
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--train-steps", type=int, default=120)
    args = ap.parse_args(argv)

    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "resynthesis_example", os.path.join(root, "examples/resynthesis.py"))
    resynth = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = resynth
    spec.loader.exec_module(resynth)
    encoder, voc, _name, vocab = resynth.build_tiny_stack()

    # synthetic training corpus: harmonic utterances through the encoder
    rng = np.random.default_rng(0)
    t = np.arange(16000) / 16000.0
    streams = []
    for i in range(8):
        f0 = 100 + 20 * i
        wav = (0.4 * np.sin(2 * np.pi * f0 * t * (1 + 0.05 * np.sin(6 * t)))
               + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        streams.append(encoder(wav)["units"])

    lm, params, loss = train_ulm(streams, vocab, steps=args.train_steps)
    print(f"ULM trained: final next-unit CE {loss:.3f} "
          f"(uniform would be {np.log(vocab):.3f})")

    if args.prompt:
        from unitspeech_tpu.data.dataset import load_wav

        wav, sr = load_wav(args.prompt)
        wav = encoder.maybe_resample(wav, sr)
    else:
        wav = (0.4 * np.sin(2 * np.pi * 130 * t[:8000])).astype(np.float32)
    prompt_units = np.asarray(encoder(wav)["units"])

    # 50 Hz deduplicated units: approximate n_new from requested seconds
    n_new = max(int(args.seconds * 16000 / encoder.code_hop_size / 2), 8)
    cont = sample_continuation(lm, params, prompt_units, n_new,
                               temperature=args.temperature)
    full = np.concatenate([prompt_units, cont])
    print(f"prompt {prompt_units.size} units -> +{cont.size} sampled: "
          f"{' '.join(map(str, cont[:24]))}{' ...' if cont.size > 24 else ''}")

    out = voc(" ".join(str(u) for u in full))
    from unitspeech_tpu.data.dataset import write_wav

    write_wav(args.output, out, 22050)
    print(f"continuation -> {args.output} ({out.shape[0] / 22050:.2f}s)")
    return loss, prompt_units, cont


if __name__ == "__main__":
    main()
