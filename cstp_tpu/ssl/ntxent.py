"""NT-Xent (SimCLR) contrastive loss with in-batch negatives.

Parity with reference ``loss/NTXent.py:5-62`` (cosine similarity,
temperature, self-pair masking). The reference constructs this in both mains
but never invokes it on a live path (vestige of the deleted ``train.py`` —
SURVEY §2.5); it is provided here both for surface parity and as a usable
loss: task ``r_byol``/``loss_com`` variants can mix it in via
``loss_weight``.

Cross-replica negatives (the north-star requirement the reference's dead
shuffle-BN code hints at, ``models/coclr/s3dg.py:427-437``): under jit/GSPMD
the (2B, 2B) similarity matrix of a 'data'-sharded batch lowers to an
all-gather of the projection vectors over ICI followed by a local matmul —
i.e. every replica sees ALL in-batch negatives automatically. No explicit
collective code is needed; inside ``shard_map`` use
``cross_replica_ntxent`` which performs the gather explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cstp_tpu.models.layers import l2_normalize


def ntxent_loss(zi: jnp.ndarray, zj: jnp.ndarray,
                temperature: float = 0.5) -> jnp.ndarray:
    """Mean NT-Xent over 2B positive pairs.

    zi, zj: (B, D) projections of two views. Matches the reference
    NTXentLoss (use_cosine_similarity=True): similarity matrix of the
    concatenated (2B, D) batch, positives at offset ±B, self-pairs masked,
    CE over the remaining 2B-1 candidates, summed over 2B samples / (2B).
    """
    b = zi.shape[0]
    z = l2_normalize(jnp.concatenate([zi, zj], axis=0).astype(jnp.float32))
    sim = z @ z.T / temperature  # (2B, 2B)
    # mask self-similarity
    eye = jnp.eye(2 * b, dtype=bool)
    sim = jnp.where(eye, -jnp.inf, sim)
    # positive index for row r: (r + B) mod 2B
    pos_idx = (jnp.arange(2 * b) + b) % (2 * b)
    logp = jax.nn.log_softmax(sim, axis=-1)
    pos_logp = jnp.take_along_axis(logp, pos_idx[:, None], axis=-1)[:, 0]
    return -jnp.mean(pos_logp)


def cross_replica_ntxent(zi: jnp.ndarray, zj: jnp.ndarray,
                         temperature: float = 0.5,
                         axis_name: str = "data") -> jnp.ndarray:
    """NT-Xent with negatives gathered across the mesh 'data' axis — for use
    INSIDE shard_map/pmap bodies where each replica holds a batch shard.
    Positives stay local; negatives are the global 2B pool."""
    zi_all = jax.lax.all_gather(zi, axis_name, axis=0, tiled=True)
    zj_all = jax.lax.all_gather(zj, axis_name, axis=0, tiled=True)
    return ntxent_loss(zi_all, zj_all, temperature)
