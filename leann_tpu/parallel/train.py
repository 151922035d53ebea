"""Contrastive encoder fine-tuning — sharded training step (dp × tp).

A capability the reference lacks entirely (it consumes frozen
sentence-transformers checkpoints): fine-tune the recompute encoder on
(query, passage) pairs with an InfoNCE objective, sharded over a
``(dp, tp)`` mesh. Batch is data-parallel; attention/MLP weights are
tensor-parallel (qkv output dim and MLP hidden dim split over ``tp``); XLA
inserts the psums/all-gathers from the sharding annotations (scaling-book
recipe: pick a mesh, annotate, let the compiler place collectives on ICI).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..embeddings.encoder import EncoderConfig, encode_tokens, init_params


def param_specs(cfg: EncoderConfig) -> Dict[str, Any]:
    """PartitionSpecs for the encoder param tree over mesh axes (dp, tp).

    qkv project D -> D_split(tp); o projects D_split(tp) -> D;
    fc1 D -> F_split(tp); fc2 F_split(tp) -> D. Embeddings/LN replicate.
    """
    ln = {"scale": P(), "bias": P()}
    layer = {
        "ln1": ln, "ln2": ln,
        "q": {"w": P(None, "tp"), "b": P("tp")},
        "k": {"w": P(None, "tp"), "b": P("tp")},
        "v": {"w": P(None, "tp"), "b": P("tp")},
        "o": {"w": P("tp", None), "b": P()},
        "fc1": {"w": P(None, "tp"), "b": P("tp")},
        "fc2": {"w": P("tp", None), "b": P()},
    }
    return {
        "tok_emb": P(),
        "pos_emb": P(),
        "emb_ln": ln,
        "final_ln": ln,
        "layers": [layer for _ in range(cfg.n_layers)],
    }


def info_nce_loss(params, q_ids, q_mask, d_ids, d_mask, cfg: EncoderConfig, temperature: float = 0.05):
    """Symmetric InfoNCE over in-batch negatives. [B,B] logits require the
    full doc batch — with dp-sharded inputs XLA materializes the all-gather."""
    qe = encode_tokens(params, q_ids, q_mask, cfg)  # [B, D]
    de = encode_tokens(params, d_ids, d_mask, cfg)
    logits = jnp.dot(qe, de.T, preferred_element_type=jnp.float32) / temperature
    labels = jax.lax.broadcasted_iota(jnp.int32, (logits.shape[0],), 0)
    l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (l_qd + l_dq)


class ContrastiveTrainer:
    """Owns sharded params + optimizer state and a jitted train step."""

    def __init__(self, cfg: EncoderConfig, mesh: Mesh, learning_rate: float = 2e-5,
                 weight_decay: float = 0.01, temperature: float = 0.05,
                 params: Dict | None = None):
        """``params``: start from an existing encoder tree (e.g. a local HF
        checkpoint via load_hf_weights) instead of seeded init — the
        fine-tuning path. Must match param_specs' structure; auxiliary keys
        (out_center/out_pc calibration) are dropped: calibration is a
        SERVING-side corpus statistic, recomputed at index build."""
        self.cfg = cfg
        self.mesh = mesh
        self.temperature = temperature
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        specs = param_specs(cfg)
        self.param_shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
        )
        if params is not None:
            host_params = {k: params[k] for k in
                           ("tok_emb", "pos_emb", "emb_ln", "final_ln", "layers")}
        else:
            host_params = init_params(cfg)
        self.params = jax.device_put(host_params, self.param_shardings)
        # optimizer state mirrors the param shardings (adam m/v are param-shaped)
        self.opt_state = self.tx.init(self.params)
        self.data_sharding = NamedSharding(mesh, P("dp", None))
        self._step = self._build_step()

    def _build_step(self):
        cfg, tx, temp = self.cfg, self.tx, self.temperature

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
            loss, grads = jax.value_and_grad(info_nce_loss)(
                params, q_ids, q_mask, d_ids, d_mask, cfg, temp
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def train_step(self, q_ids, q_mask, d_ids, d_mask) -> float:
        q_ids = jax.device_put(q_ids, self.data_sharding)
        q_mask = jax.device_put(q_mask, self.data_sharding)
        d_ids = jax.device_put(d_ids, self.data_sharding)
        d_mask = jax.device_put(d_mask, self.data_sharding)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, q_ids, q_mask, d_ids, d_mask
        )
        return float(loss)
