"""Vocoder GAN fine-tune loop (train/vocoder.py): one e2e run covering the
alternating disc/gen step (both networks update), static-structure
round-trip, and the loop + checkpoint path.  (The reference ships the
discriminators + GAN losses, BigVGAN/models.py:317-453, but no training
script.)  Kept to ONE jitted compile — the GAN graph is the most expensive
compile in the suite."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from indextts_tpu.config import BigVGANConfig
from indextts_tpu.train import vocoder as vtrain

# tiny generator: 2 upsample stages (4x), 1 resblock kind, 1 dilation
CFG = BigVGANConfig(upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
                    upsample_initial_channel=8,
                    resblock_kernel_sizes=[3],
                    resblock_dilation_sizes=[[1]],
                    speaker_embedding_dim=8, gpt_dim=16,
                    use_fused_kernel=False)


def _leaf_delta(a, b):
    return max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _all_finite(tree):
    return all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(tree)
               if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating))


def test_vocoder_gan_train_e2e(tmp_path):
    tc = vtrain.VocoderTrainConfig(batch_size=2, segment_codes=16, steps=2,
                                   log_every=1, checkpoint_every=0,
                                   periods=(2,), resolutions=((128, 32, 64),),
                                   mel_scales=((256, 64),))
    opt = vtrain.make_optimizer(tc)
    init, d_aux = vtrain.init_state(jax.random.PRNGKey(tc.seed), CFG, opt,
                                    periods=tc.periods,
                                    resolutions=tc.resolutions)
    state = vtrain.train_vocoder(CFG, tc, vtrain.synthetic_batches(CFG, tc),
                                 str(tmp_path / "out"))
    assert int(state.step) == 2
    # both networks moved off the (seed-identical) init, and stayed finite
    assert _leaf_delta(state.gen_params, init.gen_params) > 0
    assert _leaf_delta(state.disc_floats, init.disc_floats) > 0
    assert _all_finite(state.gen_params) and _all_finite(state.disc_floats)
    # static structure (period/resolution ints) survives the float split
    merged = vtrain.merge_static(jax.device_get(state.disc_floats), d_aux)
    assert merged["mpd"][0]["period"] == 2
    assert merged["mrd"][0]["resolution"] == (128, 32, 64)
    assert os.path.isdir(tmp_path / "out" / "vocoder_step_2")
