"""BigVGAN vocoder adversarial fine-tune loop — SPMD over a data mesh.

The reference ships the discriminators and GAN losses
(/root/reference/indextts/BigVGAN/models.py:317-453) but no vocoder
training script; this module supplies the loop (HiFi-GAN/BigVGAN recipe):

  disc step:  L_D = Σ ( (1-D(y))² + D(ŷ)² )                (models.py:436-447)
  gen step:   L_G = Σ (1-D(ŷ))² + 2·Σ|fmap_r - fmap_g|     (models.py:422-434)
              + λ_mel · multiscale log-mel L1               (config.yaml:125-126)

run as ONE jitted program per step (disc update then gen update — the
generator sees the refreshed discriminator, matching the torch recipe's
ordering), gradients mesh-averaged by XLA.

Data contract: batches of (latent [B, Tc, gpt_dim], mel_ref [B, Tm, 100],
wav [B, 1, Tc·1024]).  Latents come from the GPT teacher-forced re-forward
over extracted codes (engine._latents / models.unified_voice.latent_forward)
— `latent_batches` below builds them from an extraction output dir plus a
GPT checkpoint; pass any iterator with the same contract for custom data.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.models import bigvgan, discriminators as disc_lib
from indextts_tpu.parallel.mesh import initialize_distributed, make_mesh
from indextts_tpu.train import trainer as _trainer
from indextts_tpu.io import checkpoint as ckpt_io


@dataclasses.dataclass(frozen=True)
class VocoderTrainConfig:
    batch_size: int = 8
    segment_codes: int = 24       # latent frames per sample (wav = ×1024)
    steps: int = 1000
    lr: float = 1e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999       # per-step exponential (HiFi-GAN schedule)
    mel_weight: float = 45.0      # λ_mel (HiFi-GAN/BigVGAN recipe)
    feature_weight: float = 1.0
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)         # MPD (models.py:317)
    resolutions: Tuple[Tuple[int, int, int], ...] = (   # MRD (config.yaml:118)
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    mel_scales: Tuple[Tuple[int, int], ...] = (         # multiscale mel L1
        (512, 128), (1024, 256), (2048, 512))
    seed: int = 42
    log_every: int = 20
    checkpoint_every: int = 200


class VocoderTrainState(NamedTuple):
    gen_params: Dict[str, Any]
    disc_floats: list            # float leaves only (see split_static)
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


def split_static(tree) -> Tuple[list, Tuple[Any, list, list]]:
    """Separate float leaves (trainable) from static ones — the
    discriminator pytrees embed their structural ints (`period`,
    `resolution`), which grad/optax must not see."""
    flat, treedef = jax.tree.flatten(tree)
    mask = [hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            for x in flat]
    floats = [x for x, m in zip(flat, mask) if m]
    consts = [None if m else x for x, m in zip(flat, mask)]
    return floats, (treedef, mask, consts)


def merge_static(floats: list, aux) -> Any:
    treedef, mask, consts = aux
    it = iter(floats)
    return jax.tree.unflatten(treedef,
                              [next(it) if m else c
                               for m, c in zip(mask, consts)])


def make_optimizer(tc: VocoderTrainConfig) -> optax.GradientTransformation:
    sched = optax.exponential_decay(tc.lr, 1, tc.lr_decay)
    return optax.chain(optax.clip_by_global_norm(1000.0),
                       optax.adamw(sched, b1=tc.adam_b1, b2=tc.adam_b2,
                                   weight_decay=0.0))


def init_state(rng: jax.Array, cfg: BigVGANConfig,
               optimizer: optax.GradientTransformation,
               gen_params: Optional[Dict[str, Any]] = None,
               periods=(2, 3, 5, 7, 11),
               resolutions=((1024, 120, 600), (2048, 240, 1200),
                            (512, 50, 240))) -> Tuple[VocoderTrainState, Any]:
    """Start from `gen_params` (a loaded bigvgan checkpoint) or fresh init;
    discriminators always start fresh (the reference releases none).
    Returns (state, disc_aux): the state carries only the discriminators'
    float leaves; `disc_aux` holds their treedef + structural ints
    (`period`, `resolution`) — static data that must never be traced."""
    k1, k2 = jax.random.split(rng)
    if gen_params is None:
        gen_params = bigvgan.init_params(k1, cfg)
    disc_params = disc_lib.init_discriminators(k2, periods=periods,
                                               resolutions=resolutions)
    d_floats, d_aux = split_static(disc_params)
    return VocoderTrainState(gen_params, d_floats,
                             optimizer.init(gen_params),
                             optimizer.init(d_floats), jnp.int32(0)), d_aux


class VocoderBatch(NamedTuple):
    latent: jnp.ndarray   # [B, Tc, gpt_dim]
    mel_ref: jnp.ndarray  # [B, Tm, n_mels] (time-major)
    wav: jnp.ndarray      # [B, 1, Tc*1024]


def train_step(state: VocoderTrainState, batch: VocoderBatch, d_aux,
               cfg: BigVGANConfig, optimizer: optax.GradientTransformation,
               tc: VocoderTrainConfig
               ) -> Tuple[VocoderTrainState, Dict[str, jnp.ndarray]]:
    """One alternating GAN step (disc first, then gen) as one jitted program.
    `d_aux` (from init_state) must be closed over, not passed through jit —
    it carries the discriminators' structural ints."""
    gen_wav = bigvgan.forward(state.gen_params, batch.latent, batch.mel_ref, cfg)
    T = min(gen_wav.shape[-1], batch.wav.shape[-1])
    gen_wav = gen_wav[..., :T]
    real = batch.wav[..., :T]

    # --- discriminator update (generator frozen) -------------------------
    def d_loss(df):
        dp = merge_static(df, d_aux)
        r_scores, _ = disc_lib.discriminators_forward(dp, real)
        g_scores, _ = disc_lib.discriminators_forward(
            dp, jax.lax.stop_gradient(gen_wav))
        return disc_lib.discriminator_loss(r_scores, g_scores)

    ld, d_grads = jax.value_and_grad(d_loss)(state.disc_floats)
    d_updates, disc_opt = optimizer.update(d_grads, state.disc_opt,
                                           state.disc_floats)
    disc_floats = optax.apply_updates(state.disc_floats, d_updates)
    disc_params = merge_static(disc_floats, d_aux)

    # --- generator update (fresh discriminator, frozen) ------------------
    def g_loss(gp):
        wav_g = bigvgan.forward(gp, batch.latent, batch.mel_ref, cfg)[..., :T]
        r_scores, r_fmaps = disc_lib.discriminators_forward(disc_params, real)
        g_scores, g_fmaps = disc_lib.discriminators_forward(disc_params, wav_g)
        adv = disc_lib.generator_loss(g_scores)
        feat = disc_lib.feature_loss(r_fmaps, g_fmaps)
        mel = disc_lib.multiscale_mel_loss(real[:, 0], wav_g[:, 0],
                                           sample_rate=cfg.sampling_rate,
                                           scales=tc.mel_scales)
        total = adv + tc.feature_weight * feat + tc.mel_weight * mel
        return total, {"gen_adv": adv, "gen_feat": feat, "gen_mel": mel}

    (lg, parts), g_grads = jax.value_and_grad(g_loss, has_aux=True)(
        state.gen_params)
    g_updates, gen_opt = optimizer.update(g_grads, state.gen_opt,
                                          state.gen_params)
    gen_params = optax.apply_updates(state.gen_params, g_updates)

    metrics = {"disc_loss": ld, "gen_loss": lg, **parts}
    return VocoderTrainState(gen_params, disc_floats, gen_opt, disc_opt,
                             state.step + 1), metrics


# ---------------------------------------------------------------------------
# data: (latent, mel_ref, wav) batches from an extraction output dir
# ---------------------------------------------------------------------------

def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def speaker_dirs(processed_dir: str):
    """speaker_info.json (data/extract.py writes a LIST of per-speaker stats
    dicts keyed by "speaker"; speaker data lives in processed_dir/<name>) →
    [(name, dir)].  A dict form {name: {...}} is tolerated."""
    with open(os.path.join(processed_dir, "speaker_info.json")) as f:
        speakers = json.load(f)
    names = (list(speakers.keys()) if isinstance(speakers, dict)
             else [s["speaker"] for s in speakers])
    return [(n, os.path.join(processed_dir, n)) for n in names]


def latent_batches(processed_dir: str, gpt_params, gpt_cfg, tokenizer,
                   tc: VocoderTrainConfig, mel_ref_frames: int = 256,
                   sample_rate: int = 24000) -> Iterator[VocoderBatch]:
    """Stream training batches from data/extract.py outputs.

    Per record: GPT latents from the teacher-forced re-forward over the
    extracted codes (uv.latent_forward — the exact path inference vocodes
    from, infer.py:864-875), conditioned on the speaker's stored
    medoid_condition; the medoid clip's mel as the vocoder-side speaker
    reference; the source audio re-loaded at 24 kHz.  Full-length latents
    are computed once per record at bucketed widths (static shapes) and
    cached; batches are random `segment_codes`-wide crops with the aligned
    1024-samples-per-code waveform window.
    """
    from indextts_tpu.models import unified_voice as uv
    from indextts_tpu.utils.audio import load_audio

    records, med_cond, med_mel = [], {}, {}
    for name, d in speaker_dirs(processed_dir):
        med_cond[name] = np.load(os.path.join(d, "medoid_condition.npy"))
        mm = np.load(os.path.join(d, "medoid_mel.npy"))  # [100, F]
        if mm.shape[1] < mel_ref_frames:
            mm = np.tile(mm, (1, -(-mel_ref_frames // mm.shape[1])))
        med_mel[name] = mm[:, :mel_ref_frames].T[None]   # [1, F, 100]
        mpath = os.path.join(d, "metadata_train.jsonl")
        if not os.path.isfile(mpath):
            continue
        with open(mpath) as f:
            for line in f:
                records.append((name, d, json.loads(line)))
    assert records, f"no training records under {processed_dir}"

    latent_cache: Dict[int, np.ndarray] = {}

    def record_latent(idx: int) -> np.ndarray:
        if idx in latent_cache:
            return latent_cache[idx]
        name, d, rec = records[idx]
        codes = np.load(os.path.join(d, rec["codes"])).reshape(-1).astype(np.int32)
        ids = np.asarray(tokenizer.encode(rec["text"]), np.int32)
        Lt = min(_round_up(max(len(ids), 1), 16), gpt_cfg.max_text_tokens)
        Lc = min(_round_up(len(codes), 64), gpt_cfg.max_mel_tokens)
        lat = uv.latent_forward(
            gpt_params, gpt_cfg,
            jnp.asarray(med_cond[name]),
            jnp.asarray(np.pad(ids[:Lt], (0, Lt - min(len(ids), Lt)))[None]),
            jnp.asarray([min(len(ids), Lt)], np.int32),
            jnp.asarray(np.pad(codes[:Lc], (0, Lc - min(len(codes), Lc)))[None]),
            jnp.asarray([min(len(codes), Lc)], np.int32))
        latent_cache[idx] = np.asarray(lat[0, : len(codes)], np.float32)
        return latent_cache[idx]

    rng = np.random.default_rng(tc.seed)
    W = tc.segment_codes
    # mmap for the length scan — don't decode every codes array up front
    usable = [i for i, (_, d, rec) in enumerate(records)
              if np.load(os.path.join(d, rec["codes"]),
                         mmap_mode="r").reshape(-1).shape[0] >= W]
    assert usable, f"no record has ≥ {W} codes"
    wav_cache: Dict[int, np.ndarray] = {}

    def record_wav(idx: int) -> np.ndarray:
        # decoded/resampled audio cached per record — reloading the full
        # source clip per crop would starve the accelerator on slow hosts.
        # Unbounded, like latent_cache: fine at the reference's fine-tune
        # scale (~hundreds of clips); shard the manifest for huge corpora.
        if idx not in wav_cache:
            _, d, rec = records[idx]
            wav_cache[idx] = load_audio(os.path.join(d, rec["audio"]),
                                        sample_rate).reshape(-1)
        return wav_cache[idx]

    while True:
        lats, mels, wavs = [], [], []
        while len(lats) < tc.batch_size:
            idx = usable[int(rng.integers(0, len(usable)))]
            name, d, rec = records[idx]
            lat = record_latent(idx)
            wav = record_wav(idx)
            t0 = int(rng.integers(0, lat.shape[0] - W + 1))
            w = wav[t0 * 1024 : (t0 + W) * 1024]
            if w.shape[0] < W * 1024:
                w = np.pad(w, (0, W * 1024 - w.shape[0]))
            lats.append(lat[t0 : t0 + W])
            mels.append(med_mel[name][0])
            wavs.append(w[None])
        yield VocoderBatch(latent=np.stack(lats), mel_ref=np.stack(mels),
                           wav=np.stack(wavs))


def synthetic_batches(cfg: BigVGANConfig, tc: VocoderTrainConfig,
                      mel_bins: int = 100) -> Iterator[VocoderBatch]:
    """Random batches with the right shapes — loop/step smoke harness."""
    rng = np.random.default_rng(tc.seed)
    upsample = int(np.prod(cfg.upsample_rates))
    while True:
        B, W = tc.batch_size, tc.segment_codes
        yield VocoderBatch(
            latent=rng.standard_normal((B, W, cfg.gpt_dim)).astype(np.float32),
            mel_ref=rng.standard_normal((B, 64, mel_bins)).astype(np.float32),
            wav=np.tanh(rng.standard_normal((B, 1, W * upsample))
                        ).astype(np.float32))


def train_vocoder(cfg: BigVGANConfig, tc: VocoderTrainConfig,
                  batches: Iterator[VocoderBatch], out_dir: str,
                  gen_params: Optional[Dict[str, Any]] = None,
                  writer=None) -> VocoderTrainState:
    initialize_distributed()
    n_dev = jax.device_count()
    if tc.batch_size % n_dev:
        # batch doesn't tile the slice: run on the largest sub-mesh it
        # does tile (keeps the requested batch size; small smoke runs on a
        # big virtual mesh shouldn't be silently multiplied 4x)
        import math

        n_use = math.gcd(tc.batch_size, n_dev)
        mesh = make_mesh((("data", n_use),), devices=jax.devices()[:n_use])
        print(f"[vocoder] batch {tc.batch_size} on {n_use}/{n_dev} devices")
    else:
        mesh = make_mesh((("data", -1),))
    optimizer = make_optimizer(tc)
    state, d_aux = init_state(jax.random.PRNGKey(tc.seed), cfg, optimizer,
                              gen_params, periods=tc.periods,
                              resolutions=tc.resolutions)
    # cfg holds lists (unhashable) and d_aux structural ints → close over
    # both instead of static-arg'ing
    step_fn = jax.jit(lambda s, b: train_step(s, b, d_aux, cfg, optimizer, tc))
    os.makedirs(out_dir, exist_ok=True)

    def fit(x: np.ndarray) -> np.ndarray:
        x = np.asarray(x)
        if x.shape[0] == tc.batch_size:
            return x
        reps = -(-tc.batch_size // x.shape[0])
        return np.tile(x, (reps,) + (1,) * (x.ndim - 1))[: tc.batch_size]

    with mesh:
        state = _trainer.replicate(state, mesh)
        t0 = time.perf_counter()
        for i in range(tc.steps):
            b = next(batches)
            dev = VocoderBatch(*(
                _trainer.shard_batch_array(fit(x), mesh) for x in b))
            state, metrics = step_fn(state, dev)
            if (i + 1) % tc.log_every == 0 or i + 1 == tc.steps:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (i + 1) * tc.batch_size / (time.perf_counter() - t0)
                print(f"[vocoder {i+1}/{tc.steps}] D={m['disc_loss']:.3f} "
                      f"G={m['gen_loss']:.3f} mel={m['gen_mel']:.3f} "
                      f"({rate:.1f} samples/s)")
                if writer is not None:
                    for k, v in m.items():
                        writer.add_scalar(f"vocoder/{k}", v, i + 1)
            if tc.checkpoint_every and (i + 1) % tc.checkpoint_every == 0:
                _save(state, d_aux, out_dir, i + 1)
    _save(state, d_aux, out_dir, tc.steps)
    return state


def _save(state: VocoderTrainState, d_aux, out_dir: str, step: int) -> None:
    if jax.process_index() != 0:
        return
    disc = merge_static(jax.device_get(state.disc_floats), d_aux)
    ckpt_io.save_pytree(os.path.join(out_dir, f"vocoder_step_{step}"),
                        {"gen_params": jax.device_get(state.gen_params),
                         "disc_params": disc,
                         "step": step})
    print(f"[vocoder ckpt] step {step} → {out_dir}/vocoder_step_{step}")


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Adversarial BigVGAN fine-tune")
    ap.add_argument("--processed", default=None,
                    help="extraction output dir (speaker_info.json)")
    ap.add_argument("--model_dir", default="checkpoints",
                    help="dir with config.yaml, gpt/bigvgan checkpoints, bpe")
    ap.add_argument("--out", default="finetune_models/vocoder")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--segment-codes", type=int, default=24)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--synthetic", action="store_true",
                    help="random-shape smoke run (no dataset)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from indextts_tpu.config import Config

    cfg_path = os.path.join(args.model_dir, "config.yaml")
    full_cfg = Config.load(cfg_path) if os.path.exists(cfg_path) else Config()
    cfg = full_cfg.bigvgan
    tc = VocoderTrainConfig(batch_size=args.batch,
                            segment_codes=args.segment_codes,
                            steps=args.steps, lr=args.lr, seed=args.seed)
    if args.synthetic:
        train_vocoder(cfg, tc, synthetic_batches(cfg, tc), args.out)
        return
    if not args.processed:
        raise SystemExit("--processed (extraction output dir) or --synthetic "
                         "is required")

    from indextts_tpu.io import checkpoint as ckio
    from indextts_tpu.utils.tokenizer import TextTokenizer

    gpt_path = os.path.join(args.model_dir, full_cfg.gpt_checkpoint)
    gpt_params, _ = ckio.load_gpt_checkpoint(gpt_path, full_cfg.gpt)
    gen_params = None
    bv_path = os.path.join(args.model_dir, full_cfg.bigvgan_checkpoint)
    if os.path.exists(bv_path):
        gen_params = ckio.load_bigvgan_checkpoint(bv_path, cfg)
    tok = TextTokenizer(os.path.join(args.model_dir, full_cfg.dataset.bpe_model))
    batches = latent_batches(args.processed, gpt_params, full_cfg.gpt, tok, tc)
    train_vocoder(cfg, tc, batches, args.out, gen_params=gen_params)


if __name__ == "__main__":
    main()
