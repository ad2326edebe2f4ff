"""Independent numerics oracle for the reference training step.

Re-derives the reference's forward + loss + clip + Adam update
(``/root/reference/complete_vae_loss.py:7-99``,
``/root/reference/trainer.py:292-333,489-522``, MLX ``optim.Adam`` without
bias correction) in **torch on CPU** — a second, independent autodiff
implementation that shares no code with the JAX framework under test. Used
by ``tests/test_oracle_parity.py`` to prove, at the step level, that the
framework's ``reference_zero_state=True`` mode reproduces the reference
numerics: the full 9-scalar loss dict, the gradients, and the post-update
parameters (VERDICT r1 item 2 — evidence for the 1%-ELBO-parity target).

Reference semantics implemented here, independently of ``mlx_vae_tpu``:

* encoder: embedding -> stacked unidirectional LSTMs (gate order i,f,g,o,
  MLX ``nn.LSTM``) -> last-step pooling -> condition projection -> fc_mu and
  tanh'd two-layer logvar head; bounds ``mu = 2*tanh(mu_raw/2)``,
  ``logvar = tanh(logvar_raw/2) - 1`` (``/root/reference/models/encoder.py:
  106-130``),
* reparameterize ``z = mu + exp(0.5*logvar) * eps`` with *caller-supplied*
  eps (``encoder.py:134-154``),
* decoder with the zero-state quirk: every timestep runs the layer stack
  from (h, c) = 0; recurrence flows only through the fed-back token
  (``decoder.py:143,166-168``); teacher forcing = caller-supplied per-step
  batch-global mask choosing ground truth vs argmax (``decoder.py:180-185``),
* losses: unmasked token CE (``losses/recon.py:29-62``), clipped free-bits
  KL (``losses/kl.py:36-66``), MI estimator without epsilon
  (``losses/info.py:30-48``), collapse and MI penalties, property MSE,
* joint global-norm clip scaled by ``max_norm / (norm + 1e-8)`` only above
  the threshold (``trainer.py:489-522``),
* Adam without bias correction: ``p -= lr * m / (sqrt(v) + eps)``.

Everything is float32, like both the reference (MLX default) and the
framework's default compute dtype.
"""

from __future__ import annotations

import numpy as np
import torch


def _t(a) -> torch.Tensor:
    return torch.as_tensor(np.array(a, copy=True), dtype=torch.float32)


def _tree_to_torch(tree, requires_grad: bool):
    if isinstance(tree, dict):
        return {k: _tree_to_torch(v, requires_grad) for k, v in tree.items()}
    t = _t(tree)
    if requires_grad:
        t.requires_grad_(True)
    return t


def _tree_leaves(tree, out=None):
    if out is None:
        out = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            _tree_leaves(tree[k], out)
    else:
        out.append(tree)
    return out


def _linear(p, x):
    y = x @ p["weight"].T
    return y + p["bias"] if "bias" in p else y


def _lstm_cell(p, x, h, c):
    """One step, MLX nn.LSTM semantics: gates = x@Wx^T + h@Wh^T + b,
    gate order (i, f, g, o)."""
    H = h.shape[-1]
    gates = x @ p["Wx"].T + h @ p["Wh"].T + p["bias"]
    i = torch.sigmoid(gates[:, :H])
    f = torch.sigmoid(gates[:, H:2 * H])
    g = torch.tanh(gates[:, 2 * H:3 * H])
    o = torch.sigmoid(gates[:, 3 * H:])
    c2 = f * c + i * g
    h2 = o * torch.tanh(c2)
    return h2, c2


def _lstm_seq(p, xs):
    """Full sequence from zero state -> outputs [B, L, H]."""
    B, L, _ = xs.shape
    H = p["Wh"].shape[1]
    h = xs.new_zeros(B, H)
    c = xs.new_zeros(B, H)
    outs = []
    for t in range(L):
        h, c = _lstm_cell(p, xs[:, t], h, c)
        outs.append(h)
    return torch.stack(outs, dim=1)


def encoder_forward(enc, x_tok, cond, num_layers):
    out = enc["embedding"]["weight"][x_tok]
    for i in range(num_layers):
        out = _lstm_seq(enc[f"lstm_layer_{i}"], out)
    final = out[:, -1, :]
    combined = torch.cat([final, _linear(enc["condition_fc"], cond)], dim=1)
    mu_raw = _linear(enc["fc_mu"], combined)
    lv_hidden = torch.tanh(_linear(enc["fc_logvar_hidden"], combined))
    lv_raw = _linear(enc["fc_logvar"], lv_hidden)
    mu = torch.tanh(mu_raw / 2.0) * 2.0
    logvar = torch.tanh(lv_raw / 2.0) - 1.0
    return mu, logvar


def decoder_forward_zero_state(dec, z, cond, target_seq, tf_mask, num_layers,
                               start_token=0):
    """Per-timestep decode, every step from zero LSTM state (the reference
    quirk). ``tf_mask`` is a length-L bool array: True feeds the ground-truth
    token forward, False feeds the argmax prediction."""
    B, L = target_seq.shape
    H = dec["lstm_layer_0"]["Wh"].shape[1]
    token = torch.full((B,), start_token, dtype=torch.long)
    logits_all = []
    for t in range(L):
        emb = dec["embedding"]["weight"][token]
        x = torch.cat([emb, cond], dim=1)
        for l in range(num_layers):
            h = x.new_zeros(B, H)
            c = x.new_zeros(B, H)
            h, c = _lstm_cell(dec[f"lstm_layer_{l}"], x, h, c)
            x = h
        logits = _linear(dec["fc_out"], x)
        logits_all.append(logits)
        pred = torch.argmax(logits, dim=1)
        token = target_seq[:, t] if bool(tf_mask[t]) else pred
    return torch.stack(logits_all, dim=1)  # [B, L, V]


def reconstruction_loss(logits, targets):
    V = logits.shape[-1]
    flat = logits.reshape(-1, V)
    log_probs = flat - torch.logsumexp(flat, dim=1, keepdim=True)
    picked = log_probs.gather(1, targets.reshape(-1, 1).long())[:, 0]
    return -picked.mean()


def kl_divergence(mu, logvar, free_bits):
    D = mu.shape[-1]
    mu = torch.clamp(mu, -3.0, 3.0)
    logvar = torch.clamp(logvar, -6.0, 3.0)
    var = torch.exp(logvar)
    kl = -0.5 * (1.0 + logvar - mu ** 2 - var)
    kl = torch.clamp(kl, min=0.0)
    if free_bits > 0:
        kl = torch.clamp(kl, min=free_bits / D)
    return kl.sum(dim=-1).mean()


def mutual_information(mu, logvar):
    mu = torch.clamp(mu, -3.0, 3.0)
    logvar = torch.clamp(logvar, -6.0, 3.0)
    var = torch.exp(logvar)
    kl_per = -0.5 * (1.0 + logvar - mu ** 2 - var).sum(dim=1)
    mean_mu = mu.mean(dim=0)
    mean_var = var.mean(dim=0)
    agg = -0.5 * (1.0 + torch.log(mean_var) - mean_mu ** 2 - mean_var).sum()
    return torch.clamp(kl_per.mean() - agg, min=0.0)


def oracle_loss(params, x_tok, cond, eps, tf_mask, num_layers, hyp):
    """Reference ``complete_vae_loss`` on torch tensors. ``params`` is the
    {"encoder","decoder"[,"predictor"]} tree of torch tensors."""
    mu, logvar = encoder_forward(params["encoder"], x_tok, cond, num_layers)
    z = mu + torch.exp(0.5 * logvar) * eps
    logits = decoder_forward_zero_state(params["decoder"], z, cond, x_tok,
                                        tf_mask, num_layers)
    recon = reconstruction_loss(logits, x_tok)
    kl = kl_divergence(mu, logvar, hyp["free_bits"])
    mi = mutual_information(mu, logvar)
    collapse = hyp["lambda_collapse"] * torch.clamp(hyp["target_mi"] - mi, min=0.0)
    mi_penalty = hyp["lambda_mi"] * torch.clamp(hyp["target_mi"] - mi, min=0.0)
    if "predictor" in params:
        pred = params["predictor"]
        hid = torch.relu(_linear(pred["fc_hidden"], z))
        prop = ((_linear(pred["fc_out"], hid) - cond) ** 2).mean()
    else:
        prop = torch.zeros(())
    total = (recon + hyp["beta"] * kl + collapse + hyp["lambda_prop"] * prop
             + mi_penalty)
    return {
        "total_loss": total, "recon_loss": recon, "kl_loss": kl,
        "weighted_kl": hyp["beta"] * kl, "collapse_penalty": collapse,
        "prop_loss": prop, "weighted_prop_loss": hyp["lambda_prop"] * prop,
        "mutual_info": mi, "mi_penalty": mi_penalty,
    }


def _loss_and_raw_grads(params_np, x, cond, eps, tf_mask, num_layers, hyp):
    """Loss dict (floats) + raw pre-clip gradients (numpy tree) at
    ``params_np``."""
    params = _tree_to_torch(params_np, requires_grad=True)
    x_tok = torch.as_tensor(np.asarray(x), dtype=torch.long)
    losses = oracle_loss(params, x_tok, _t(cond), _t(eps),
                         np.asarray(tf_mask), num_layers, hyp)
    leaves = _tree_leaves(params)
    grads = torch.autograd.grad(losses["total_loss"], leaves,
                                allow_unused=True)
    grads = [g if g is not None else torch.zeros_like(p)
             for g, p in zip(grads, leaves)]

    def rebuild(tree, flat_iter):
        if isinstance(tree, dict):
            return {k: rebuild(tree[k], flat_iter) for k in sorted(tree)}
        return next(flat_iter)

    grad_tree = rebuild(params, iter(g.detach().numpy() for g in grads))
    loss_np = {k: float(v.detach()) for k, v in losses.items()}
    return loss_np, grad_tree


def _np_tree(fn, *trees):
    if isinstance(trees[0], dict):
        return {k: _np_tree(fn, *(t[k] for t in trees)) for k in trees[0]}
    return fn(*trees)


def oracle_train_trajectory(params_np, xs, conds, epses, tf_masks, num_layers,
                            beta, lambda_prop=0.1, lambda_collapse=0.001,
                            free_bits=1.0, lambda_mi=0.01, target_mi=4.85,
                            lr=2e-4, grad_clip=1.0,
                            adam_b1=0.9, adam_b2=0.999, adam_eps=1e-8):
    """``S`` consecutive reference training steps with PERSISTENT Adam
    moments (the single-step oracle starts from zero state; a trajectory is
    what the reference actually runs — ``/root/reference/trainer.py:292-333``
    repeated per batch, the optimizer states carrying across).

    ``xs [S, B, L]`` int tokens, ``conds [S, B, C]``, ``epses [S, B, D]``
    reparameterization noise, ``tf_masks [S, L]`` bool teacher-forcing masks
    (all caller-supplied so the framework and the oracle consume identical
    randomness). ``beta`` may be a scalar or a length-S sequence.

    Returns ``(loss_dicts, final_params, grad_norms)``: per-step loss
    scalars, the post-trajectory parameter tree (numpy), and the raw
    global grad norm per step (lets tests assert the clip actually fired).
    """
    S = len(xs)
    betas = [float(beta)] * S if np.ndim(beta) == 0 else [float(b) for b in beta]
    params = _np_tree(lambda a: np.array(a, dtype=np.float32, copy=True),
                      params_np)
    m_state = _np_tree(np.zeros_like, params)
    v_state = _np_tree(np.zeros_like, params)

    loss_dicts, grad_norms = [], []
    for s in range(S):
        hyp = dict(beta=betas[s], lambda_prop=lambda_prop,
                   lambda_collapse=lambda_collapse, free_bits=free_bits,
                   lambda_mi=lambda_mi, target_mi=target_mi)
        loss_np, grads = _loss_and_raw_grads(params, xs[s], conds[s],
                                             epses[s], tf_masks[s],
                                             num_layers, hyp)
        flat = []
        _np_flatten(grads, flat)
        norm = float(np.sqrt(sum(float((g.astype(np.float64) ** 2).sum())
                                 for g in flat)))
        # float32 norm like both implementations (float64 above is only for
        # the returned diagnostic; the clip uses the f32 value).
        norm32 = np.float32(np.sqrt(np.float32(
            sum(np.float32((g ** 2).sum()) for g in flat))))
        if grad_clip > 0 and norm32 > grad_clip:
            scale = np.float32(grad_clip) / (norm32 + np.float32(1e-8))
            grads = _np_tree(lambda g: g * scale, grads)

        def upd(p, g, m, v):
            m2 = adam_b1 * m + (1 - adam_b1) * g
            v2 = adam_b2 * v + (1 - adam_b2) * g * g
            p2 = p - lr * m2 / (np.sqrt(v2) + adam_eps)
            return p2.astype(np.float32), m2.astype(np.float32), \
                v2.astype(np.float32)

        def upd_tree(p, g, m, v):
            if isinstance(p, dict):
                out_p, out_m, out_v = {}, {}, {}
                for k in p:
                    out_p[k], out_m[k], out_v[k] = upd_tree(p[k], g[k],
                                                            m[k], v[k])
                return out_p, out_m, out_v
            return upd(p, g, m, v)

        params, m_state, v_state = upd_tree(params, grads, m_state, v_state)
        loss_dicts.append(loss_np)
        grad_norms.append(norm)
    return loss_dicts, params, grad_norms


def _np_flatten(tree, out):
    if isinstance(tree, dict):
        for k in sorted(tree):
            _np_flatten(tree[k], out)
    else:
        out.append(tree)


def oracle_train_step(params_np, x, conditions, eps, tf_mask, num_layers,
                      beta, lambda_prop=0.1, lambda_collapse=0.001,
                      free_bits=1.0, lambda_mi=0.01, target_mi=4.85,
                      lr=2e-4, grad_clip=1.0,
                      adam_b1=0.9, adam_b2=0.999, adam_eps=1e-8):
    """One full reference training step from fresh (zero) Adam moments.

    Returns ``(loss_dict, grads, new_params)`` as numpy trees matching the
    input structure.
    """
    hyp = dict(beta=beta, lambda_prop=lambda_prop,
               lambda_collapse=lambda_collapse, free_bits=free_bits,
               lambda_mi=lambda_mi, target_mi=target_mi)
    params = _tree_to_torch(params_np, requires_grad=True)
    x_tok = torch.as_tensor(np.asarray(x), dtype=torch.long)
    cond = _t(conditions)
    eps_t = _t(eps)

    losses = oracle_loss(params, x_tok, cond, eps_t, np.asarray(tf_mask),
                         num_layers, hyp)
    leaves = _tree_leaves(params)
    grads = torch.autograd.grad(losses["total_loss"], leaves,
                                allow_unused=True)
    grads = [g if g is not None else torch.zeros_like(p)
             for g, p in zip(grads, leaves)]

    # Joint global-norm clip (reference trainer.py:489-522).
    norm = torch.sqrt(sum((g ** 2).sum() for g in grads))
    if grad_clip > 0 and float(norm) > grad_clip:
        scale = grad_clip / (float(norm) + 1e-8)
        grads = [g * scale for g in grads]

    # MLX Adam, no bias correction, per-component states.
    def rebuild(tree, flat_iter):
        if isinstance(tree, dict):
            return {k: rebuild(tree[k], flat_iter) for k in sorted(tree)}
        return next(flat_iter)

    grad_tree = rebuild(params, iter(grads))

    def adam(p_tree, g_tree):
        if isinstance(p_tree, dict):
            return {k: adam(p_tree[k], g_tree[k]) for k in p_tree}
        g = g_tree
        m = (1 - adam_b1) * g
        v = (1 - adam_b2) * g ** 2
        return p_tree.detach() - lr * m / (torch.sqrt(v) + adam_eps)

    new_params = {name: adam(params[name], grad_tree[name])
                  for name in params}

    def to_np(tree):
        if isinstance(tree, dict):
            return {k: to_np(v) for k, v in tree.items()}
        return tree.detach().numpy()

    loss_np = {k: float(v.detach()) for k, v in losses.items()}
    return loss_np, to_np(grad_tree), to_np(new_params)
