"""Reference PyTorch checkpoint interop.

The reference saves torch checkpoints
``{epoch, model_state_dict, optimizer_state_dict, loss, val_loss}``
(scripts/train.py:60-67).  This module maps the reference
``EdgePropertyPredictionModel`` state dict (gnngls/models.py:44-70, with DGL
0.6.1 GATConv parameters ``fc.weight``/``attn_l``/``attn_r``) onto our pytree
params, so shipped ``checkpoint_best_val.pt`` files run unchanged on TPU.

Key map (reference torch name -> ours):
  embed_layer.{weight,bias}                                 -> embed
  message_passing_layers.{i}.message_passing.module.fc.weight -> layers[i].gat.fc_w (T)
  message_passing_layers.{i}.message_passing.module.attn_{l,r} (1,H,F) -> (H,F)
  message_passing_layers.{i}.feed_forward.0.*               -> layers[i].bn1 (+state)
  message_passing_layers.{i}.feed_forward.1.module.{0,2}.*  -> layers[i].ffn{1,2} (T)
  message_passing_layers.{i}.feed_forward.2.*               -> layers[i].bn2 (+state)
  decision_layer.{weight,bias}                              -> decision

Torch Linear weights are (out, in) and transpose to our (in, out).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.gat import GATParams
from ..ops.linear import LinearParams
from ..ops.norm import BatchNormParams, BatchNormState
from .regret_gat import (
    AttentionLayerParams,
    AttentionLayerState,
    RegretGNNConfig,
    RegretGNNParams,
    RegretGNNState,
)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def params_from_state_dict(sd: Dict, cfg: RegretGNNConfig
                           ) -> Tuple[RegretGNNParams, RegretGNNState]:
    """Build (params, bn_state) from a reference model state dict."""
    def lin(prefix):
        w = _np(sd[f"{prefix}.weight"]).T
        b = _np(sd[f"{prefix}.bias"])
        return LinearParams(jnp.asarray(w), jnp.asarray(b))

    def bn(prefix):
        p = BatchNormParams(jnp.asarray(_np(sd[f"{prefix}.weight"])),
                            jnp.asarray(_np(sd[f"{prefix}.bias"])))
        s = BatchNormState(jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
                           jnp.asarray(_np(sd[f"{prefix}.running_var"])))
        return p, s

    layers, states = [], []
    i = 0
    while f"message_passing_layers.{i}.message_passing.module.fc.weight" in sd:
        mp = f"message_passing_layers.{i}"
        gat = GATParams(
            fc_w=jnp.asarray(_np(sd[f"{mp}.message_passing.module.fc.weight"]).T),
            attn_l=jnp.asarray(_np(sd[f"{mp}.message_passing.module.attn_l"])[0]),
            attn_r=jnp.asarray(_np(sd[f"{mp}.message_passing.module.attn_r"])[0]),
        )
        bn1, bn1s = bn(f"{mp}.feed_forward.0")
        bn2, bn2s = bn(f"{mp}.feed_forward.2")
        layers.append(AttentionLayerParams(
            gat=gat, bn1=bn1,
            ffn1=lin(f"{mp}.feed_forward.1.module.0"),
            ffn2=lin(f"{mp}.feed_forward.1.module.2"),
            bn2=bn2,
        ))
        states.append(AttentionLayerState(bn1=bn1s, bn2=bn2s))
        i += 1

    if i != cfg.depth:
        raise ValueError(f"checkpoint has {i} layers, config expects {cfg.depth} "
                         f"(n_heads={cfg.n_heads}, depth_from_heads={cfg.depth_from_heads})")

    return (RegretGNNParams(embed=lin("embed_layer"), layers=layers,
                            decision=lin("decision_layer")),
            RegretGNNState(states))


def load_checkpoint(path, cfg: RegretGNNConfig):
    """Load a reference .pt checkpoint file (torch required, CPU)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    params, state = params_from_state_dict(sd, cfg)
    meta = {k: ckpt[k] for k in ("epoch", "loss", "val_loss") if k in ckpt}
    return params, state, meta


def state_dict_from_params(params: RegretGNNParams, state: RegretGNNState) -> Dict:
    """Export our pytree back to a reference-format torch state dict."""
    import torch

    def t(x):
        return torch.tensor(np.asarray(x))

    sd = {
        "embed_layer.weight": t(params.embed.w).T.contiguous(),
        "embed_layer.bias": t(params.embed.b),
        "decision_layer.weight": t(params.decision.w).T.contiguous(),
        "decision_layer.bias": t(params.decision.b),
    }
    for i, (lp, ls) in enumerate(zip(params.layers, state.layers)):
        mp = f"message_passing_layers.{i}"
        sd[f"{mp}.message_passing.module.fc.weight"] = t(lp.gat.fc_w).T.contiguous()
        sd[f"{mp}.message_passing.module.attn_l"] = t(lp.gat.attn_l)[None]
        sd[f"{mp}.message_passing.module.attn_r"] = t(lp.gat.attn_r)[None]
        for name, bnp, bns in (("feed_forward.0", lp.bn1, ls.bn1),
                               ("feed_forward.2", lp.bn2, ls.bn2)):
            sd[f"{mp}.{name}.weight"] = t(bnp.scale)
            sd[f"{mp}.{name}.bias"] = t(bnp.bias)
            sd[f"{mp}.{name}.running_mean"] = t(bns.mean)
            sd[f"{mp}.{name}.running_var"] = t(bns.var)
            sd[f"{mp}.{name}.num_batches_tracked"] = torch.tensor(0)
        sd[f"{mp}.feed_forward.1.module.0.weight"] = t(lp.ffn1.w).T.contiguous()
        sd[f"{mp}.feed_forward.1.module.0.bias"] = t(lp.ffn1.b)
        sd[f"{mp}.feed_forward.1.module.2.weight"] = t(lp.ffn2.w).T.contiguous()
        sd[f"{mp}.feed_forward.1.module.2.bias"] = t(lp.ffn2.b)
    return sd
