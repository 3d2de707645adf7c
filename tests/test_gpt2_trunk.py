"""GPT-2 trunk numerics vs the HF torch implementation (the exact module the
reference wraps, gpt/model.py:263-286), with shared weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from indextts_tpu.models import gpt2

SIZE = gpt2.GPT2Size(layers=3, dim=64, heads=4)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import GPT2Config, GPT2Model

    cfg = GPT2Config(
        vocab_size=32,
        n_positions=128,
        n_ctx=128,
        n_embd=SIZE.dim,
        n_layer=SIZE.layers,
        n_head=SIZE.heads,
        activation_function="gelu_new",
        use_cache=True,
        attn_pdrop=0.0,
        embd_pdrop=0.0,
        resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPT2Model(cfg).eval()
    # null wpe like the reference (gpt/model.py:280-282)
    with torch.no_grad():
        model.wpe.weight.zero_()
    return model


def hf_to_params(model) -> dict:
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    L = SIZE.layers

    def stack(fmt):
        return jnp.asarray(np.stack([sd[fmt.format(i)] for i in range(L)]))

    return {
        "blocks": {
            "ln_1": {"scale": stack("h.{}.ln_1.weight"), "bias": stack("h.{}.ln_1.bias")},
            "attn": {
                "qkv_w": stack("h.{}.attn.c_attn.weight"),
                "qkv_b": stack("h.{}.attn.c_attn.bias"),
                "proj_w": stack("h.{}.attn.c_proj.weight"),
                "proj_b": stack("h.{}.attn.c_proj.bias"),
            },
            "ln_2": {"scale": stack("h.{}.ln_2.weight"), "bias": stack("h.{}.ln_2.bias")},
            "mlp": {
                "fc_w": stack("h.{}.mlp.c_fc.weight"),
                "fc_b": stack("h.{}.mlp.c_fc.bias"),
                "proj_w": stack("h.{}.mlp.c_proj.weight"),
                "proj_b": stack("h.{}.mlp.c_proj.bias"),
            },
        },
        "ln_f": {"scale": jnp.asarray(sd["ln_f.weight"]), "bias": jnp.asarray(sd["ln_f.bias"])},
    }


def test_forward_matches_hf(hf_model):
    params = hf_to_params(hf_model)
    rng = np.random.default_rng(0)
    B, T = 2, 10
    embeds = rng.standard_normal((B, T, SIZE.dim)).astype(np.float32)
    # left-padded mask like prepare_gpt_inputs (gpt/model.py:606-667)
    mask = np.ones((B, T), dtype=np.int64)
    mask[1, :3] = 0

    with torch.no_grad():
        ref = hf_model(
            inputs_embeds=torch.from_numpy(embeds),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    ours = np.asarray(gpt2.forward(params, jnp.asarray(embeds), jnp.asarray(mask), SIZE))
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_remat_forward_matches(hf_model):
    params = hf_to_params(hf_model)
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.standard_normal((1, 7, SIZE.dim)).astype(np.float32))
    base = gpt2.forward(params, embeds, None, SIZE, remat=False)
    remat = gpt2.forward(params, embeds, None, SIZE, remat=True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(remat), rtol=1e-6, atol=1e-6)


def test_prefill_decode_matches_full_forward(hf_model):
    """The KV-cache incremental path must agree with the full forward — the
    core decode invariant (reference analogue: padding_test.py)."""
    params = hf_to_params(hf_model)
    rng = np.random.default_rng(1)
    B, T_prompt, T_total, cache_len = 2, 6, 12, 16
    embeds = rng.standard_normal((B, T_total, SIZE.dim)).astype(np.float32)
    mask_np = np.ones((B, T_prompt), dtype=np.int32)
    mask_np[0, :2] = 0  # left padding on sample 0

    out_pre, cache = gpt2.prefill(
        params, jnp.asarray(embeds[:, :T_prompt]), jnp.asarray(mask_np), SIZE, cache_len
    )

    full_mask = np.zeros((B, cache_len), dtype=np.int32)
    full_mask[:, :T_prompt] = mask_np
    outs = [np.asarray(out_pre)]
    for t in range(T_prompt, T_total):
        full_mask[:, t] = 1
        step_out, cache = gpt2.decode_step(
            params,
            jnp.asarray(embeds[:, t : t + 1]),
            cache,
            jnp.int32(t),
            jnp.asarray(full_mask),
            SIZE,
        )
        outs.append(np.asarray(step_out))
    incremental = np.concatenate(outs, axis=1)

    full_mask_t = np.ones((B, T_total), dtype=np.int32)
    full_mask_t[0, :2] = 0
    ref = np.asarray(
        gpt2.forward(params, jnp.asarray(embeds), jnp.asarray(full_mask_t), SIZE)
    )
    valid = full_mask_t.astype(bool)
    np.testing.assert_allclose(incremental[valid], ref[valid], rtol=2e-4, atol=2e-4)
