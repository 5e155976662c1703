"""StyleGAN2 GAN losses, functional, for the conditional inpainting setting.

Loss spec from the reference ``StyleGAN2Loss``
(`/root/reference/lib/experiments/stylegan_default_loss.py:16-128`):

  * non-saturating softplus GAN loss,
  * style mixing with prob 0.9 (`:34-38`),
  * path-length regularization (pl_weight 2, pl_decay 0.01, batch shrink 2,
    `:72-88`) — needs grad-of-grad, which ``jax.grad`` composes natively
    (the reference needed the custom ``conv2d_gradfix`` op for this),
  * R1 penalty γ=10 on real images (`:118-128`).

The reference's released training loop targets the *unconditional* StyleGAN;
for the CoModGAN/SH-GAN inpainting setting we condition G on
``x = cat([mask−0.5, real·mask])`` (the eval-time contract,
`shgan_default.py:274`) and feed D 4-channel inputs
``cat([mask−0.5, img])`` (the D configs have ic_n=4,
`configs/model/comodgan.yaml:51-58`).

All functions are pure; EMA/statistics state (w_avg, pl_mean) is threaded in
and out explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def run_g(G, params_g, x_in, z, c, rng, style_mixing_prob=0.9,
          update_w_avg=True, train=True):
    """Generator forward with style mixing; returns (img, ws, new_w_avg)."""
    k_map, k_mix, k_enc, k_noise = jax.random.split(rng, 4)
    if update_w_avg:
        ws, new_w_avg = G.mapping(params_g["mapping"], z, c,
                                  update_w_avg=True)
    else:
        ws = G.mapping(params_g["mapping"], z, c)
        new_w_avg = None
    if style_mixing_prob > 0:
        num_ws = ws.shape[1]
        k_cut, k_p, k_z = jax.random.split(k_mix, 3)
        cutoff = jax.random.randint(k_cut, (), 1, num_ws)
        cutoff = jnp.where(jax.random.uniform(k_p, ()) < style_mixing_prob,
                           cutoff, num_ws)
        z2 = jax.random.normal(k_z, z.shape, z.dtype)
        ws2 = G.mapping(params_g["mapping"], z2, c)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, num_ws, 1), 1)
        ws = jnp.where(idx >= cutoff, ws2, ws)

    x_global, feats = G.encoder(params_g["encoder"], x_in, rng=k_enc,
                                train=train)
    img = G.synthesis(params_g["synthesis"], x_global, feats, ws,
                      noise_mode="random", rng=k_noise)
    return img, ws, new_w_avg


def g_main_loss(G, D, params_g, params_d, x_in, mask, z, c, rng,
                style_mixing_prob=0.9):
    """Non-saturating generator loss (reference loss `:61-70`)."""
    img, _ws, new_w_avg = run_g(G, params_g, x_in, z, c, rng,
                                style_mixing_prob)
    d_in = jnp.concatenate([mask - 0.5, img], axis=1)
    gen_logits = D(params_d, d_in, c)
    loss = jax.nn.softplus(-gen_logits).mean()
    return loss, {"w_avg": new_w_avg, "scores_fake": gen_logits.mean()}


def g_pl_loss(G, params_g, x_in, z, c, rng, pl_mean, pl_decay=0.01,
              pl_weight=2.0, pl_batch_shrink=2, style_mixing_prob=0.9):
    """Path-length regularization on a shrunk batch (reference loss `:73-88`).

    Returns (loss, new_pl_mean, pl_lengths_mean).  The inner grad w.r.t. ws
    composes with the outer parameter grad (grad-of-grad).
    """
    n = max(x_in.shape[0] // pl_batch_shrink, 1)
    x_s, z_s = x_in[:n], z[:n]
    c_s = None if c is None else c[:n]
    k_map, k_mix, k_enc, k_syn, k_noise = jax.random.split(rng, 5)

    # the reference's Gpl mapping forward also advances the w_avg buffer
    # (run_G has no skip flag there, stylegan.py:416-417) — return the
    # update for the train step to chain after the Gmain one
    ws, new_w_avg = G.mapping(params_g["mapping"], z_s, c_s,
                              update_w_avg=True)
    num_ws = ws.shape[1]
    k_cut, k_p, k_z = jax.random.split(k_mix, 3)
    cutoff = jax.random.randint(k_cut, (), 1, num_ws)
    cutoff = jnp.where(jax.random.uniform(k_p, ()) < style_mixing_prob,
                       cutoff, num_ws)
    ws2 = G.mapping(params_g["mapping"],
                    jax.random.normal(k_z, z_s.shape, z_s.dtype), c_s)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, num_ws, 1), 1)
    ws = jnp.where(idx >= cutoff, ws2, ws)

    x_global, feats = G.encoder(params_g["encoder"], x_s, rng=k_enc,
                                train=True)
    res = G.synthesis.resolution
    pl_noise = jax.random.normal(
        k_noise, (n, G.synthesis.rgb_n, res, res),
        jnp.float32) / jnp.sqrt(jnp.asarray(res * res, jnp.float32))

    def synth_out(ws_in):
        img2 = G.synthesis(params_g["synthesis"], x_global, feats, ws_in,
                           noise_mode="random", rng=k_syn)
        return (img2 * pl_noise).sum()

    pl_grads = jax.grad(synth_out)(ws)
    pl_lengths = jnp.sqrt(jnp.square(pl_grads).sum(axis=2).mean(axis=1))
    # pl_mean.lerp(lengths.mean(), decay) (reference loss `:81`).  The
    # penalty differentiates THROUGH the lerped mean — the reference
    # detaches only the buffer copy (loss `:82-84`), so the generator
    # gradient carries the -decay/n cross term
    new_pl_mean = pl_mean + pl_decay * (pl_lengths.mean() - pl_mean)
    pl_penalty = jnp.square(pl_lengths - new_pl_mean)
    loss = (pl_penalty * pl_weight).mean()
    return loss, new_pl_mean, pl_lengths.mean(), new_w_avg


def d_main_loss(G, D, params_g, params_d, x_in, mask, real, z, c, rng,
                style_mixing_prob=0.9):
    """Discriminator main loss: softplus(D(gen)) + softplus(−D(real))
    (reference loss `:92-116`)."""
    # update_w_avg=True: the reference's Dmain run_G also advances the
    # w_avg buffer (run_G has no skip flag, stylegan.py:416-417)
    img, _ws, new_w_avg = run_g(G, params_g, x_in, z, c, rng,
                                style_mixing_prob=style_mixing_prob,
                                update_w_avg=True)
    img = jax.lax.stop_gradient(img)
    gen_logits = D(params_d, jnp.concatenate([mask - 0.5, img], axis=1), c)
    real_logits = D(params_d,
                    jnp.concatenate([mask - 0.5, real], axis=1), c)
    loss = (jax.nn.softplus(gen_logits)
            + jax.nn.softplus(-real_logits)).mean()
    return loss, {"scores_fake": gen_logits.mean(),
                  "scores_real": real_logits.mean(),
                  "w_avg": new_w_avg}


def d_r1_loss(D, params_d, mask, real, c, r1_gamma=10.0):
    """R1 gradient penalty on real images (reference loss `:118-128`):
    γ/2 · ‖∂D(real)/∂real‖² — gradient w.r.t. the real RGB only."""

    def d_out(real_in):
        return D(params_d,
                 jnp.concatenate([mask - 0.5, real_in], axis=1), c).sum()

    r1_grads = jax.grad(d_out)(real)
    r1_penalty = jnp.square(r1_grads).sum(axis=(1, 2, 3))
    return (r1_penalty * (r1_gamma / 2)).mean(), r1_penalty.mean()


def unconditional_g_main_loss(G, D, params_g, params_d, z, c, rng,
                              style_mixing_prob=0.9):
    """Plain StyleGAN2 G loss for the unconditional model family."""
    k_map, k_mix, k_noise = jax.random.split(rng, 3)
    ws, new_w_avg = G.mapping(params_g["mapping"], z, c, update_w_avg=True)
    if style_mixing_prob > 0:
        num_ws = ws.shape[1]
        k_cut, k_p, k_z = jax.random.split(k_mix, 3)
        cutoff = jax.random.randint(k_cut, (), 1, num_ws)
        cutoff = jnp.where(jax.random.uniform(k_p, ()) < style_mixing_prob,
                           cutoff, num_ws)
        ws2 = G.mapping(params_g["mapping"],
                        jax.random.normal(k_z, z.shape, z.dtype), c)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, num_ws, 1), 1)
        ws = jnp.where(idx >= cutoff, ws2, ws)
    img = G.synthesis(params_g["synthesis"], ws, noise_mode="random",
                      rng=k_noise)
    logits = D(params_d, img, c)
    return jax.nn.softplus(-logits).mean(), {"w_avg": new_w_avg}
