#!/usr/bin/env python
"""Staged full-forward compare: JAX pipeline vs an independent torch
implementation, stage by stage, on REAL (or synthetic) weights.

Day-one forensic tool (reference analogue:
``/root/reference/scripts/compare_full_forward.py``): when a real-weight
transcription comes out wrong, this localizes the divergence in ONE run
instead of a bisect.  Stages:

    mel -> conv -> encoder(L layers) -> reshape4+adapter
        -> decoder prefill (prefix-38, ADA) -> final norm -> logits

Each stage's torch output is computed from the documented formulas
(interleaved-pair RoPE theta=1e6, banded sliding windows, encoder biases
q/v/o + FFN w2 only, ADA after ffn_norm with exact GELU, tied lm_head —
SURVEY.md §2.2), NOT from our JAX code, and compared with per-stage
max-abs-error against the JAX pipeline run in f32.

Usage:
  python scripts/compare_forward_stages.py <model_dir> [--seconds 1.5]
      [--tol 2e-3] [--platform cpu]

Exit 0 = all stages within tolerance.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------------------
# torch reference forward (independent implementation)
# ---------------------------------------------------------------------------


def torch_stages(model_dir: Path, mel: np.ndarray, delay: float):
    import torch

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.loaders import names as N
    from voxtral_tpu.loaders.safetensors_loader import SafeTensorsFile
    from voxtral_tpu.models.voxtral import PREFIX_LEN, make_prefix_ids

    cfg = VoxtralConfig.from_model_dir(model_dir)
    st = SafeTensorsFile(model_dir / "consolidated.safetensors")
    t = lambda name: torch.from_numpy(  # noqa: E731
        np.array(st.tensor(name, np.float32)))
    stages: dict[str, np.ndarray] = {}

    def rms(x, w, eps):
        return x * torch.rsqrt((x * x).mean(-1, keepdim=True) + eps) * w

    def rope(x, positions, theta=1e6):
        # interleaved pairs (reference rope.rs:103-141)
        b, s, h, d = x.shape
        half = d // 2
        inv = 1.0 / (theta ** (torch.arange(half, dtype=torch.float64)
                               * 2.0 / d))
        ang = positions[:, None].double() * inv[None, :]
        cos = torch.cos(ang).float()[None, :, None, :]
        sin = torch.sin(ang).float()[None, :, None, :]
        xe, xo = x[..., 0::2], x[..., 1::2]
        out = torch.empty_like(x)
        out[..., 0::2] = xe * cos - xo * sin
        out[..., 1::2] = xe * sin + xo * cos
        return out

    def attention(x, wq, wk, wv, wo, bq, bv, bo, n_heads, n_kv, hd,
                  window, theta):
        b, s, _ = x.shape
        pos = torch.arange(s)
        q = (x @ wq.T + (bq if bq is not None else 0)).view(b, s, n_heads, hd)
        k = (x @ wk.T).view(b, s, n_kv, hd)
        v = (x @ wv.T + (bv if bv is not None else 0)).view(b, s, n_kv, hd)
        q, k = rope(q, pos, theta), rope(k, pos, theta)
        groups = n_heads // n_kv
        k = k.repeat_interleave(groups, dim=2)
        v = v.repeat_interleave(groups, dim=2)
        scores = torch.einsum("bqhd,bkhd->bhqk", q, k) / (hd ** 0.5)
        diff = pos[:, None] - pos[None, :]
        mask = (diff >= 0) & (diff <= window)
        scores = scores.masked_fill(~mask[None, None], float("-inf"))
        probs = torch.softmax(scores, dim=-1)
        ctx = torch.einsum("bhqk,bkhd->bqhd", probs, v)
        out = ctx.reshape(b, s, n_heads * hd) @ wo.T
        return out + (bo if bo is not None else 0)

    # -- conv ---------------------------------------------------------------
    cv = N.conv_names()
    m = torch.from_numpy(mel)
    c = torch.nn.functional.conv1d(
        m, t(cv["conv1_weight"]), t(cv["conv1_bias"]), stride=2, padding=1)
    c = torch.nn.functional.gelu(c)
    c = torch.nn.functional.conv1d(
        c, t(cv["conv2_weight"]), t(cv["conv2_bias"]), stride=2, padding=1)
    c = torch.nn.functional.gelu(c)
    stages["conv"] = c.numpy()

    # -- encoder ------------------------------------------------------------
    e = cfg.audio_encoder
    x = c.transpose(1, 2)  # [B, T/4, D]
    for i in range(e.n_layers):
        nm = N.encoder_layer_names(i)
        h = rms(x, t(nm["attention_norm"]), e.norm_eps)
        x = x + attention(
            h, t(nm["wq_weight"]), t(nm["wk_weight"]), t(nm["wv_weight"]),
            t(nm["wo_weight"]), t(nm["wq_bias"]), t(nm["wv_bias"]),
            t(nm["wo_bias"]), e.n_heads, e.n_kv_heads, e.head_dim,
            e.sliding_window, e.rope_theta)
        h = rms(x, t(nm["ffn_norm"]), e.norm_eps)
        gate = torch.nn.functional.silu(h @ t(nm["w1_weight"]).T)
        up = h @ t(nm["w3_weight"]).T
        x = x + (gate * up) @ t(nm["w2_weight"]).T + t(nm["w2_bias"])
    x = rms(x, t(N.ENCODER_FINAL_NORM), e.norm_eps)
    stages["encoder"] = x.numpy()

    # -- reshape(4) + adapter -----------------------------------------------
    b, s, d = x.shape
    f = 4
    x = x[:, : (s // f) * f].reshape(b, s // f, d * f)
    an = N.adapter_names()
    x = torch.nn.functional.gelu(x @ t(an["linear1_weight"]).T)
    audio_embeds = x @ t(an["linear2_weight"]).T
    stages["adapter"] = audio_embeds.numpy()

    # -- decoder prefill (prefix-38) -----------------------------------------
    lm = cfg.language_model
    emb = t(N.TOK_EMBEDDINGS)
    prefix = torch.from_numpy(make_prefix_ids().astype(np.int64))
    text = emb[prefix][None]
    hidden = audio_embeds[:, :PREFIX_LEN] + text

    # sinusoidal t-embedding (time_embedding.rs:41-71)
    half = lm.dim // 2
    freqs = torch.exp(-np.log(10000.0)
                      * torch.arange(half, dtype=torch.float64) / half)
    ang = torch.tensor(delay, dtype=torch.float64) * freqs
    t_embed = torch.cat([torch.cos(ang), torch.sin(ang)]).float()[None, None]

    pos = torch.arange(PREFIX_LEN)
    xd = hidden
    for i in range(lm.n_layers):
        nm = N.decoder_layer_names(i)
        h = rms(xd, t(nm["attention_norm"]), lm.norm_eps)
        xd = xd + attention(
            h, t(nm["wq_weight"]), t(nm["wk_weight"]), t(nm["wv_weight"]),
            t(nm["wo_weight"]), None, None, None,
            lm.n_heads, lm.n_kv_heads, lm.head_dim,
            lm.sliding_window, lm.rope_theta)
        h = rms(xd, t(nm["ffn_norm"]), lm.norm_eps)
        scale = torch.nn.functional.gelu(
            t_embed @ t(nm["ada_norm_down"]).T) @ t(nm["ada_norm_up"]).T
        h = h * (1 + scale)
        gate = torch.nn.functional.silu(h @ t(nm["w1_weight"]).T)
        up = h @ t(nm["w3_weight"]).T
        xd = xd + (gate * up) @ t(nm["w2_weight"]).T
        if i == 0:
            stages["decoder_layer0"] = xd.numpy()
    xd = rms(xd, t(N.FINAL_NORM), lm.norm_eps)
    stages["final_hidden"] = xd.numpy()
    stages["logits_last"] = (xd[:, -1] @ emb.T).numpy()
    return stages


# ---------------------------------------------------------------------------
# JAX pipeline stages
# ---------------------------------------------------------------------------


def jax_stages(model_dir: Path, mel: np.ndarray, delay: float):
    import jax
    import jax.numpy as jnp

    from voxtral_tpu.config import VoxtralConfig
    from voxtral_tpu.loaders.safetensors_loader import load_voxtral_params
    from voxtral_tpu.models.adapter import (
        adapter_forward,
        reshape_encoder_output,
    )
    from voxtral_tpu.models.decoder import (
        decoder_forward_hidden,
        embed_tokens,
        lm_head,
    )
    from voxtral_tpu.models.encoder import encoder_forward
    from voxtral_tpu.models.layers import (
        conv_downsample,
        decoder_block,
        rope_tables,
    )
    from voxtral_tpu.models.voxtral import (
        PREFIX_LEN,
        make_prefix_ids,
        time_embedding,
    )

    cfg = VoxtralConfig.from_model_dir(model_dir)
    params = load_voxtral_params(model_dir / "consolidated.safetensors",
                                 cfg, dtype="float32")
    stages: dict[str, np.ndarray] = {}
    x = jnp.asarray(mel, jnp.float32)

    conv = conv_downsample(x, params["encoder"]["conv"])
    stages["conv"] = np.asarray(conv)

    enc = encoder_forward(params["encoder"], x, cfg.audio_encoder)
    stages["encoder"] = np.asarray(enc)

    audio_embeds = adapter_forward(
        params["adapter"], reshape_encoder_output(enc, 4))
    stages["adapter"] = np.asarray(audio_embeds)

    lm_cfg = cfg.language_model
    prefix = jnp.asarray(make_prefix_ids())[None]
    text = embed_tokens(params["decoder"], prefix)
    hidden = audio_embeds[:, :PREFIX_LEN] + text
    t_embed = jnp.asarray(
        time_embedding(delay, lm_cfg.dim), jnp.float32)

    # Layer 0 alone (via decoder_block) for the staged compare, then the
    # full prefill via the production entry point.
    from voxtral_tpu.models.decoder import decoder_spec

    spec = decoder_spec(lm_cfg)
    rope = rope_tables(lm_cfg.head_dim, PREFIX_LEN, lm_cfg.rope_theta)
    lyr0 = jax.tree_util.tree_map(
        lambda a: a[0], params["decoder"]["layers"])
    x0 = decoder_block(hidden, t_embed, lyr0, spec, rope[0], rope[1],
                       jnp.arange(PREFIX_LEN), lm_cfg.norm_eps)
    stages["decoder_layer0"] = np.asarray(x0)

    # decoder_forward_hidden applies the final RMSNorm itself.
    final = decoder_forward_hidden(params["decoder"], hidden, t_embed,
                                   lm_cfg)
    stages["final_hidden"] = np.asarray(final)
    stages["logits_last"] = np.asarray(
        lm_head(params["decoder"], final[:, -1]))
    return stages


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir")
    ap.add_argument("--seconds", type=float, default=1.5)
    ap.add_argument("--delay", type=float, default=6.0)
    ap.add_argument("--tol", type=float, default=2e-3,
                    help="relative max-abs tolerance per stage")
    ap.add_argument("--platform", default="cpu",
                    help="JAX platform (torch side always runs on CPU)")
    args = ap.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from voxtral_tpu.audio import (
        AudioBuffer,
        MelSpectrogram,
        PadConfig,
        pad_audio,
    )

    sr = 16000
    tt = np.arange(int(args.seconds * sr)) / sr
    sig = (0.4 * np.sin(2 * np.pi * 440 * tt)
           + 0.2 * np.sin(2 * np.pi * 1320 * tt)).astype(np.float32)
    buf = AudioBuffer(sig, sr)
    buf.peak_normalize(0.95)
    padded = pad_audio(buf, PadConfig.voxtral())
    mel = MelSpectrogram.voxtral().compute_log_batch(padded.samples)
    mel = np.asarray(mel, np.float32)

    model_dir = Path(args.model_dir)
    print("# computing torch reference stages ...", flush=True)
    ref = torch_stages(model_dir, mel, args.delay)
    print("# computing JAX pipeline stages ...", flush=True)
    got = jax_stages(model_dir, mel, args.delay)

    failed = []
    print(f"\n{'stage':<16}{'shape':<22}{'max_abs':>12}{'rel':>12}")
    for name, r in ref.items():
        g = got[name]
        if g.shape != r.shape:
            print(f"{name:<16}SHAPE MISMATCH {g.shape} vs {r.shape}")
            failed.append(name)
            continue
        err = float(np.max(np.abs(g - r)))
        scale = float(np.max(np.abs(r))) + 1e-9
        rel = err / scale
        flag = "" if rel <= args.tol else "  <-- DIVERGES"
        print(f"{name:<16}{str(list(r.shape)):<22}{err:>12.3e}"
              f"{rel:>12.3e}{flag}")
        if rel > args.tol:
            failed.append(name)
    if failed:
        print(f"\nFIRST DIVERGING STAGE: {failed[0]} — inspect that "
              "component's weights/layout first.")
        return 1
    print("\nall stages match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
