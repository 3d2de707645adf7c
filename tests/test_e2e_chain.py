"""Chained torch-mirror full-pipeline e2e oracle (VERDICT r3 next #1/#3).

A reference-faithful CPU pipeline replicating /root/reference/indextts/
infer.py:779-917 — wav → mel (torch.stft) → get_conditioning → HF
``generate`` with the GPT2InferenceModel semantics (gpt/model.py:45-218,
606-720) → remove_long_silence (infer.py:446-497) → return_latent forward
(gpt/model.py:548-593) → BigVGAN (models.py:203-252) — driven with the SAME
exported ``.pth`` weights and greedy settings as ``engine.infer`` /
``infer_fast`` / ``infer_stream``.  Stage-boundary bugs (mask plumbing,
position offsets at the [cond|text|mel] seams, stop-token trimming,
silence-compression interaction) are exactly what the per-component oracles
cannot catch; this chain can, and with real weights unavailable in-image it
is the strongest regression gate this environment can produce.

Also hosts the full-sequence HF ``generate(num_beams=3)`` oracle
(gpt/model.py:669-720 + infer.py:628-635): complete beam-searched token
sequences must match ``inference_speech_beam`` exactly across
length-penalty settings.
"""

import os
import shutil

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from indextts_tpu.config import Config
from indextts_tpu.io.checkpoint import convert_gpt_state_dict
from indextts_tpu.models import ecapa as ecapa_jax
from indextts_tpu.models import unified_voice as uv
from indextts_tpu.ops.mel import mel_filterbank
from indextts_tpu.utils import audio as audio_io
from tests.test_bigvgan import TorchBigVGAN
from tests.test_conditioning import TorchUnifiedVoice

SAMPLE = "/root/reference/tests/sample_prompt.wav"
VOCAB = "/root/reference/vocab.txt"

# identical to tests/test_engine.py's model_dir so the jitted decode/vocoder
# programs (same static shapes + dtypes) are shared across the two modules
MODEL_YAML = {
    "gpt": {
        "model_dim": 64, "layers": 2, "heads": 4, "max_mel_tokens": 64,
        "max_text_tokens": 120,
        "condition_module": {
            "output_size": 32, "linear_units": 64, "attention_heads": 4,
            "num_blocks": 2, "perceiver_mult": 2,
        },
    },
    "bigvgan": {
        "upsample_rates": [4, 4, 4, 4, 2, 2],
        "upsample_kernel_sizes": [8, 8, 4, 4, 4, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "speaker_embedding_dim": 8,
        "gpt_dim": 64,
        "use_fused_kernel": False,
    },
}


# ---------------------------------------------------------------------------
# torch mirrors of the reference inference stack
# ---------------------------------------------------------------------------

def torch_mel(wav: np.ndarray) -> torch.Tensor:
    """torchaudio MelSpectrogram(power=1, center=True) + safe_log via
    torch.stft (feature_extractors.py:26-68; the filterbank matrix is the
    fixed HTK-scale constant already property-tested in test_mel.py)."""
    xt = torch.from_numpy(np.asarray(wav, np.float32))
    spec = torch.stft(
        xt, n_fft=1024, hop_length=256, win_length=1024,
        window=torch.hann_window(1024), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True).abs()
    fb = torch.from_numpy(mel_filterbank(24000, 1024, 100))  # [513, 100]
    mel = torch.einsum("bft,fm->bmt", spec, fb)
    return torch.log(torch.clamp(mel, min=1e-7))


class TorchInferenceModel(
        __import__("transformers").models.gpt2.modeling_gpt2.GPT2PreTrainedModel,
        __import__("transformers").generation.GenerationMixin):
    """Mirror of the reference GPT2InferenceModel (gpt/model.py:45-218):
    a GenerationMixin head over the UnifiedVoice trunk whose "input ids"
    are mel codes; the [cond|text] prefix is a cached embedding and the
    per-step mel position is ``attention_mask_len - prefix_len`` (the
    reference's position-1-skip quirk)."""

    def __init__(self, config, gpt, mel_pos_weight, mel_embedding, final_norm,
                 mel_head):
        super().__init__(config)
        self.transformer = gpt
        self.mel_pos_weight = mel_pos_weight      # [max_mel_seq_len, D]
        self.mel_embeddings = mel_embedding
        self.head = nn.Sequential(final_norm, mel_head)
        self.cached_mel_emb = None

    def store_mel_emb(self, mel_emb):
        self.cached_mel_emb = mel_emb

    def prepare_inputs_for_generation(self, input_ids, past_key_values=None,
                                      **kwargs):
        # NOTE: a fresh DynamicCache already has len == n_layers in
        # transformers 4.57, so "past exists" must key on the SEQUENCE
        # length (the reference's `if past_key_values:` predates Cache
        # objects, gpt/model.py:94-99)
        past_len = 0
        if past_key_values is not None:
            past_len = (past_key_values.get_seq_length()
                        if hasattr(past_key_values, "get_seq_length")
                        else len(past_key_values))
        if past_len > 0:
            input_ids = input_ids[:, -1:]
        return {
            "input_ids": input_ids,
            "past_key_values": past_key_values,
            "use_cache": kwargs.get("use_cache"),
            "attention_mask": kwargs.get("attention_mask"),
        }

    def forward(self, input_ids=None, past_key_values=None,
                attention_mask=None, use_cache=None, return_dict=None,
                **kwargs):
        from transformers.modeling_outputs import (
            CausalLMOutputWithCrossAttentions)

        mel_len = self.cached_mel_emb.shape[1]
        if input_ids.shape[1] != 1:
            # first call: [fake prefix ids | start_mel]; embed the mel part
            mel_inputs = input_ids[:, mel_len:]
            emb = self.mel_embeddings(mel_inputs)
            emb = emb + self.mel_pos_weight[: emb.shape[1]][None]
            if self.cached_mel_emb.shape[0] != emb.shape[0]:
                mel_emb = self.cached_mel_emb.repeat_interleave(
                    emb.shape[0] // self.cached_mel_emb.shape[0], 0)
            else:
                mel_emb = self.cached_mel_emb
            emb = torch.cat([mel_emb, emb], dim=1)
        else:
            emb = self.mel_embeddings(input_ids)
            emb = emb + self.mel_pos_weight[
                attention_mask.shape[1] - mel_len][None, None]
        out = self.transformer(
            inputs_embeds=emb, past_key_values=past_key_values,
            attention_mask=attention_mask, use_cache=use_cache,
            return_dict=True)
        return CausalLMOutputWithCrossAttentions(
            logits=self.head(out.last_hidden_state),
            past_key_values=out.past_key_values)


def make_inference_model(tm: TorchUnifiedVoice) -> TorchInferenceModel:
    from transformers import GPT2Config

    cfg = tm.cfg
    gcfg = GPT2Config(
        vocab_size=cfg.number_mel_codes, n_positions=256,
        n_embd=cfg.model_dim, n_layer=cfg.layers, n_head=cfg.heads)
    return TorchInferenceModel(
        gcfg, tm.gpt, tm.mel_pos_embedding.emb.weight, tm.mel_embedding,
        tm.final_norm, tm.mel_head).eval()


def torch_inference_speech(tm, inf_model, conds, text_ids, max_mel_tokens,
                           **generate_kwargs):
    """prepare_gpt_inputs + inference_model.generate (gpt/model.py:606-720),
    B=1."""
    cfg = tm.cfg
    text = text_ids[0]
    text = text[(text != cfg.start_text_token) & (text != cfg.stop_text_token)]
    text = F.pad(text, (1, 0), value=cfg.start_text_token)
    text = F.pad(text, (0, 1), value=cfg.stop_text_token)
    pos = torch.arange(text.shape[-1])
    text_emb = tm.text_embedding(text) + tm.text_pos_embedding.emb(pos)
    mel_emb = torch.cat([conds[0], text_emb])[None]
    inf_model.store_mel_emb(mel_emb)
    fake = torch.ones((1, mel_emb.shape[1] + 1), dtype=torch.long)
    fake[:, -1] = cfg.start_mel_token
    trunc = fake.shape[1]
    out = inf_model.generate(
        fake, bos_token_id=cfg.start_mel_token,
        pad_token_id=cfg.stop_mel_token, eos_token_id=cfg.stop_mel_token,
        attention_mask=torch.ones_like(fake),
        max_length=trunc + max_mel_tokens, **generate_kwargs)
    return out[:, trunc:]


def ref_remove_long_silence(codes: torch.Tensor, stop_token: int,
                            silent_token: int = 52, max_consecutive: int = 30):
    """Independent port of the reference remove_long_silence
    (infer.py:446-497): effective length at the first stop token, runs of
    silence clipped to 10 frames when total silence exceeds the threshold,
    stop-token padding back to the batch max."""
    code_lens, codes_list = [], []
    for i in range(codes.shape[0]):
        code = codes[i]
        if not bool((code == stop_token).any()):
            len_ = code.shape[0]
        else:
            len_ = int((code == stop_token).nonzero(as_tuple=False)[0])
        if int((code == silent_token).sum()) > max_consecutive:
            keep_idx, n = [], 0
            for k in range(len_):
                if int(code[k]) != silent_token:
                    keep_idx.append(k)
                    n = 0
                elif n < 10:
                    keep_idx.append(k)
                    n += 1
            codes_list.append(code[keep_idx])
            code_lens.append(len(keep_idx))
        else:
            codes_list.append(code[:len_])
            code_lens.append(len_)
    max_len = max(code_lens)
    out = torch.full((codes.shape[0], max_len), stop_token, dtype=codes.dtype)
    for i, c in enumerate(codes_list):
        out[i, : c.shape[0]] = c
    return out, torch.tensor(code_lens, dtype=torch.long)


def torch_infer(tm, inf_model, tbv, tokenizer, prompt_path, text,
                max_text_tokens_per_sentence=120, max_mel_tokens=64,
                **generate_kwargs):
    """The reference per-sentence pipeline (infer.py:779-917), assembled
    from the torch mirrors.  Returns (int16 wav [T], per-sentence codes,
    per-sentence code_lens)."""
    wav_np = audio_io.load_prompt_audio(prompt_path, 24000)
    cond_mel = torch_mel(wav_np)                                   # [1,100,T]
    with torch.no_grad():
        conds = tm.get_conditioning(
            cond_mel, torch.tensor([cond_mel.shape[-1]]))          # [1,32,D]
    sentences = tokenizer.split_sentences(
        tokenizer.tokenize(text), max_text_tokens_per_sentence)
    wavs, all_codes, all_lens = [], [], []
    for sent in sentences:
        ids = torch.tensor(tokenizer.convert_tokens_to_ids(sent),
                           dtype=torch.long)[None]
        with torch.no_grad():
            codes = torch_inference_speech(tm, inf_model, conds, ids,
                                           max_mel_tokens, **generate_kwargs)
            codes, code_lens = ref_remove_long_silence(
                codes, tm.cfg.stop_mel_token)
            latent = tm.latent_forward(conds, ids, codes)          # [1,L,D]
            wav = tbv(latent, cond_mel.transpose(1, 2))            # [1,1,L*1024]
        wav = torch.clamp(32767.0 * wav.squeeze(1), -32767.0, 32767.0)
        wavs.append(wav)
        all_codes.append(codes[0].numpy())
        all_lens.append(int(code_lens[0]))
    wav = torch.cat(wavs, dim=1)
    return (wav.squeeze(0).numpy().astype("int16"), all_codes, all_lens)


# ---------------------------------------------------------------------------
# fixtures: one shared weight set, exported as reference .pth files
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    torch.manual_seed(7)
    d = tmp_path_factory.mktemp("e2e_ckpt")
    cfg = Config.from_dict(MODEL_YAML)
    cfg.save(str(d / "config.yaml"))
    shutil.copy(VOCAB, d / "vocab.txt")

    tm = TorchUnifiedVoice(cfg.gpt).eval()
    ecapa_size = ecapa_jax.ECAPASize(
        input_size=cfg.bigvgan.num_mels,
        lin_neurons=cfg.bigvgan.speaker_embedding_dim)
    tbv = TorchBigVGAN(cfg.bigvgan, ecapa_size).eval()
    with torch.no_grad():
        for m in tbv.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
        # the tiny random vocoder emits sub-quantum audio (|wav|*32767 < 1
        # → int16 all zeros, a vacuous comparison); bias the output conv so
        # both chains synthesize loud audio
        tbv.conv_post.bias += 1.0

    torch.save({"model": tm.reference_state_dict()}, d / "gpt.pth")
    torch.save({"generator": tbv.state_dict()}, d / "bigvgan_generator.pth")

    import warnings

    from indextts_tpu import engine as engine_mod

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = engine_mod.IndexTTS(
            cfg_path=str(d / "config.yaml"), model_dir=str(d),
            is_fp16=False,
            precision_config={"gpt": "fp32", "vocoder": "fp32"})
    return tm, make_inference_model(tm), tbv, tts


def _push_head_bias(tm, tts, deltas):
    """Apply the same mel-head bias surgery to BOTH chains (token → +delta);
    returns an undo closure.  Params-only change: the engine's compiled
    decode programs are reused (bias is a traced leaf)."""
    saved_torch = tm.mel_head.bias.detach().clone()
    saved_jax = tts.gpt_params["mel_head"]["bias"]
    b = np.asarray(saved_jax).copy()
    with torch.no_grad():
        for tok, delta in deltas.items():
            tm.mel_head.bias[tok] += delta
            b[tok] += delta
    new = {**tts.gpt_params, "mel_head": {**tts.gpt_params["mel_head"],
                                          "bias": jnp.asarray(b)}}
    tts.gpt_params = new
    tts.gpt_params_batched = new

    def undo():
        with torch.no_grad():
            tm.mel_head.bias.copy_(saved_torch)
        old = {**tts.gpt_params,
               "mel_head": {**tts.gpt_params["mel_head"], "bias": saved_jax}}
        tts.gpt_params = old
        tts.gpt_params_batched = old

    return undo


GREEDY = dict(do_sample=False, num_beams=1, repetition_penalty=10.0)


# ---------------------------------------------------------------------------
# the chained oracle
# ---------------------------------------------------------------------------

def test_chain_infer_matches_torch_pipeline(bundle, tmp_path):
    """engine.infer == the reference-faithful torch chain, waveform
    bit-close.  The stop token is biased out so every sentence decodes to
    exactly the 64-token budget — the engine's bucket width — making the
    teacher-forced re-forward and vocode EXACT-length on both sides (no
    padded-tail receptive-field ambiguity): the comparison covers every
    sample of the waveform."""
    tm, inf_model, tbv, tts = bundle
    undo = _push_head_bias(tm, tts, {tts.cfg.gpt.stop_mel_token: -40.0})
    try:
        text = "你好。"
        ref_wav, ref_codes, ref_lens = torch_infer(
            tm, inf_model, tbv, tts.tokenizer, SAMPLE, text,
            max_mel_tokens=64, **GREEDY)
        assert ref_lens == [64]  # budget reached, no stop: exact-width chain

        # spy on the engine's decode + latent stages for stage-level parity
        captured = {}
        orig_decode = uv.inference_speech
        orig_latent = uv.latent_forward

        def spy_decode(*a, **kw):
            r = orig_decode(*a, **kw)
            captured.setdefault("codes", []).append(
                (np.asarray(r.codes), np.asarray(r.lengths)))
            return r

        def spy_latent(*a, **kw):
            r = orig_latent(*a, **kw)
            captured.setdefault("latents", []).append(np.asarray(r))
            return r

        uv.inference_speech = spy_decode
        uv.latent_forward = spy_latent
        try:
            out = str(tmp_path / "chain.wav")
            tts.infer(SAMPLE, text, out, max_mel_tokens=64, **GREEDY)
        finally:
            uv.inference_speech = orig_decode
            uv.latent_forward = orig_latent

        # stage 1: decode codes EXACT vs HF generate
        codes, lens = captured["codes"][0]
        assert int(lens[0]) == 64
        np.testing.assert_array_equal(codes[0, :64], ref_codes[0][:64])

        # stage 2: teacher-forced latents match the exact-length torch
        # re-forward on the valid prefix (the engine buckets text to 16)
        with torch.no_grad():
            ids = torch.tensor(tts.tokenizer.convert_tokens_to_ids(
                tts.tokenizer.tokenize(text)), dtype=torch.long)[None]
            wav_np = audio_io.load_prompt_audio(SAMPLE, 24000)
            cond_mel = torch_mel(wav_np)
            conds = tm.get_conditioning(
                cond_mel, torch.tensor([cond_mel.shape[-1]]))
            ref_lat = tm.latent_forward(
                conds, ids, torch.from_numpy(ref_codes[0][None]).long()).numpy()
        got_lat = captured["latents"][0][:, :64]
        np.testing.assert_allclose(got_lat, ref_lat, rtol=5e-3, atol=5e-3)

        # stage 3: the full waveform, every sample (raw int16 PCM;
        # audio.read_wav would normalise to [-1, 1])
        from scipy.io import wavfile

        sr, got_wav = wavfile.read(out)
        got_wav = got_wav.reshape(-1)
        assert sr == 24000 and got_wav.dtype == np.int16
        assert got_wav.shape == ref_wav.shape == (64 * 1024,)
        np.testing.assert_allclose(got_wav.astype(np.int32),
                                   ref_wav.astype(np.int32), atol=2)
        assert np.abs(ref_wav).max() > 1000  # non-vacuous: loud audio
    finally:
        undo()


def test_chain_infer_fast_and_stream_match_torch_pipeline(bundle, tmp_path):
    """The batched (infer_fast) and streaming paths reproduce the same
    torch-chain waveform for multi-sentence input: bucketing, batched
    latent re-forward and per-sentence trim are glue the per-component
    oracles never see."""
    tm, inf_model, tbv, tts = bundle
    undo = _push_head_bias(tm, tts, {tts.cfg.gpt.stop_mel_token: -40.0})
    try:
        text = "你好。再見。"
        kw = dict(max_mel_tokens=64, max_text_tokens_per_sentence=3, **GREEDY)
        ref_wav, ref_codes, ref_lens = torch_infer(
            tm, inf_model, tbv, tts.tokenizer, SAMPLE, text, **kw)
        assert len(ref_codes) >= 2      # genuinely multi-sentence
        assert all(n == 64 for n in ref_lens)

        out = str(tmp_path / "fast.wav")
        tts.infer_fast(SAMPLE, text, out, **kw)
        from scipy.io import wavfile

        _, got_wav = wavfile.read(out)
        got_wav = got_wav.reshape(-1)
        assert got_wav.shape == ref_wav.shape
        np.testing.assert_allclose(got_wav.astype(np.int32),
                                   ref_wav.astype(np.int32), atol=2)

        chunks = list(tts.infer_stream(SAMPLE, text, **kw))
        assert len(chunks) == len(ref_codes)
        got_stream = np.concatenate([c for _, c in chunks])
        np.testing.assert_allclose(got_stream.astype(np.int32),
                                   ref_wav.astype(np.int32), atol=2)
    finally:
        undo()


def test_chain_silence_compression_interaction(bundle, tmp_path):
    """Silence compression mid-chain: bias the head so greedy emits a long
    run of the silent token (52); both chains must compress it identically
    and re-forward/vocode the SAME shortened code sequence
    (infer.py:446-497 → 864-875 interaction)."""
    tm, inf_model, tbv, tts = bundle
    # 52 dominant even under presence penalty (logit 60/10 = 6 still wins),
    # stop biased out: greedy emits 64×52 → compressed to the first 10
    undo = _push_head_bias(
        tm, tts, {52: 60.0, tts.cfg.gpt.stop_mel_token: -80.0})
    try:
        text = "你好。"
        ref_wav, ref_codes, ref_lens = torch_infer(
            tm, inf_model, tbv, tts.tokenizer, SAMPLE, text,
            max_mel_tokens=64, **GREEDY)
        assert ref_lens == [10]                    # 64 silents → keep 10
        assert (ref_codes[0][:10] == 52).all()

        captured = {}
        orig_decode = uv.inference_speech

        def spy_decode(*a, **kw):
            r = orig_decode(*a, **kw)
            captured["codes"] = np.asarray(r.codes)
            captured["lens"] = np.asarray(r.lengths)
            return r

        uv.inference_speech = spy_decode
        try:
            out = str(tmp_path / "sil.wav")
            tts.infer(SAMPLE, text, out, max_mel_tokens=64, **GREEDY)
        finally:
            uv.inference_speech = orig_decode

        assert int(captured["lens"][0]) == 64
        assert (captured["codes"][0, :64] == 52).all()
        from scipy.io import wavfile

        _, got_wav = wavfile.read(out)
        got_wav = got_wav.reshape(-1)
        # both chains compressed 64 → 10 codes → 10*1024 samples
        assert got_wav.shape == ref_wav.shape == (10 * 1024,)
        # the engine vocodes a stop-padded width-64 latent and trims; the
        # reference vocodes the exact 10-code latent — samples inside the
        # padded tail's receptive field may differ, so compare the prefix
        # the padding cannot reach (vocoder receptive field ≈ 8 codes)
        np.testing.assert_allclose(got_wav[: 2 * 1024].astype(np.int32),
                                   ref_wav[: 2 * 1024].astype(np.int32),
                                   atol=2)
    finally:
        undo()


def test_remove_long_silence_matches_reference_port():
    """Host-side parity fuzz: the engine's vectorised remove_long_silence ==
    the independent reference port for random batches (trim at first stop,
    clip runs to 10, stop-token padding)."""
    from indextts_tpu.engine import remove_long_silence

    rng = np.random.default_rng(3)
    stop = 8193
    for trial in range(20):
        B = int(rng.integers(1, 4))
        T = int(rng.integers(5, 80))
        codes = rng.choice([52, 52, 52, 7, 9, stop],
                           p=[0.3, 0.2, 0.2, 0.14, 0.14, 0.02],
                           size=(B, T)).astype(np.int64)
        t_codes, t_lens = ref_remove_long_silence(
            torch.from_numpy(codes), stop)
        # engine API takes already-trimmed codes + lens: derive them the way
        # the decode loop does (first stop token)
        lens = np.asarray([
            int((row == stop).argmax()) if (row == stop).any() else T
            for row in codes])
        e_codes, e_lens = remove_long_silence(codes, lens, stop_token=stop)
        np.testing.assert_array_equal(e_lens, t_lens.numpy(), err_msg=str(trial))
        for b in range(B):
            np.testing.assert_array_equal(
                e_codes[b, : e_lens[b]], t_codes[b, : t_lens[b]].numpy(),
                err_msg=str(trial))


# ---------------------------------------------------------------------------
# full-sequence HF generate beam oracle (VERDICT r3 next #3)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("length_penalty,stop_bias", [
    (0.0, 0.0), (1.0, 2.5), (-2.0, 2.5)])
def test_beam_full_sequence_matches_hf_generate(bundle, length_penalty,
                                                stop_bias):
    """inference_speech_beam == HF generate(num_beams=3, do_sample=False)
    at the FULL-sequence level (gpt/model.py:669-720, infer.py:628-635):
    same tokens, same lengths, across length penalties; stop_bias > 0 makes
    eos candidates competitive so hypothesis banking is genuinely
    exercised."""
    tm, inf_model, _, tts = bundle
    cfg = tts.cfg.gpt
    undo = (_push_head_bias(tm, tts, {cfg.stop_mel_token: stop_bias})
            if stop_bias else (lambda: None))
    try:
        rng = np.random.default_rng(11)
        cond = rng.standard_normal((1, 32, cfg.model_dim)).astype(np.float32)
        ids = rng.integers(2, 200, (7,)).astype(np.int64)

        with torch.no_grad():
            hf = torch_inference_speech(
                tm, inf_model, torch.from_numpy(cond), torch.from_numpy(ids)[None],
                max_mel_tokens=16, do_sample=False, num_beams=3,
                repetition_penalty=10.0,
                length_penalty=length_penalty).numpy()[0]
        hf_stop = hf == cfg.stop_mel_token
        hf_len = int(hf_stop.argmax()) if hf_stop.any() else len(hf)

        prep = uv.prepare_text_prompt([ids], cfg.start_text_token,
                                      cfg.stop_text_token)
        r = uv.inference_speech_beam(
            tts.gpt_params_batched, cfg, jnp.asarray(cond),
            jnp.asarray(prep.text_tokens), jnp.asarray(prep.attn_text),
            jax.random.PRNGKey(0), max_new=16, num_beams=3, do_sample=False,
            repetition_penalty=10.0, length_penalty=length_penalty,
            cache_dtype=jnp.float32)
        got_len = int(np.asarray(r.lengths)[0])
        assert got_len == hf_len, (np.asarray(r.codes)[0], hf)
        np.testing.assert_array_equal(
            np.asarray(r.codes)[0, :got_len], hf[:hf_len])
    finally:
        undo()
