"""Small-leaf parameter packing: O(10) DMA descriptors instead of O(1000).

WHY (docs/PERF.md, round-3 CelebA MFU pass): the batch-64 bf16 trace of the
CelebA train step showed the device ~75% idle against async HBM→VMEM DMA of
*hundreds of tiny parameter tensors* — f32[32] biases, BN scales, SN u/v
vectors, noise weights across the ~100 spectral-norm sites of the
5-generator SAGAN decoder plus the ResNet trunk's BN tensors (716 f32[32]
copy ops ≈ 33 ms/step in-flight vs 37 ms of synchronous compute). Each
small leaf is its own HBM buffer, its own prefetch descriptor — and with
Adam, its own m and v buffers too, tripling the descriptor count.

The fix is structural, not numeric: concatenate every small floating leaf
of the params pytree into ONE flat buffer per dtype and reconstruct the
original pytree *inside* the compiled program with static slices. XLA then
stages a handful of large contiguous buffers instead of ~1000 scraps;
`optax` state (elementwise Adam) and gradients follow the packed structure
automatically, so m and v collapse to single buffers as well.

Exactness: packing is a bijective re-layout.
* forward/loss: `unpack` rebuilds bit-identical leaves (slice + reshape of
  the values `pack` wrote);
* gradients: each packed element receives exactly the contributions its
  unpacked twin would (slices are disjoint; a leaf used k times in the
  forward still sums the same k cotangents);
* Adam: fully elementwise, so updating the concatenation equals
  concatenating the updates.
Only large leaves (conv kernels, dense matrices — above ``max_size``
elements) stay as separate buffers: XLA picks tiled layouts for them that
a flat re-layout would destroy, and big transfers amortize their
descriptors anyway.

No reference counterpart (the torch original has no analogous machinery);
this is TPU-side performance scope. Measured A/B: docs/PERF.md round 4.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Leaves with at most this many elements get packed. Chosen so every bias /
# BN scale / SN u / SN v / noise weight in the framework packs (largest is
# an SN "v" at 3*3*512 = 4608) while all conv kernels and dense matrices
# (>= 3*3*32*32 = 9216) keep their XLA-chosen tiled layouts.
DEFAULT_MAX_SIZE = 8192


class Packer:
    """Re-layout transform between a params pytree and its packed form.

    Built once from a template pytree (shapes/dtypes/structure are fixed
    thereafter — the usual jit contract). The packed form is itself a
    pytree::

        {"packed": {"<dtype>": flat_1d_array, ...},
         "big":    (big_leaf_0, big_leaf_1, ...)}

    so it drops into optimizer states, scan carries, donation, and
    checkpointing unchanged. ``pack``/``unpack`` are pure jax functions,
    safe inside jit/scan/shard_map (and cheap: one concatenate / a set of
    static slices, fused by XLA).
    """

    def __init__(self, template, max_size: int = DEFAULT_MAX_SIZE):
        leaves, self.treedef = jax.tree_util.tree_flatten(template)
        self.n_leaves = len(leaves)
        # leaf i -> ("small", dtype_key, offset, shape) | ("big", position)
        self._plan = []
        self._sizes: dict[str, int] = {}  # dtype_key -> total elements
        n_big = 0
        for leaf in leaves:
            if (hasattr(leaf, "size") and hasattr(leaf, "dtype")
                    and jnp.issubdtype(leaf.dtype, jnp.floating)
                    and leaf.size <= max_size):
                dk = jnp.dtype(leaf.dtype).name
                off = self._sizes.get(dk, 0)
                self._plan.append(("small", dk, off, tuple(leaf.shape)))
                self._sizes[dk] = off + leaf.size
            else:
                self._plan.append(("big", n_big))
                n_big += 1
        self.n_small = self.n_leaves - n_big
        self.n_big = n_big

    def pack(self, tree):
        """params pytree -> packed pytree (bit-identical values)."""
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        if treedef != self.treedef:
            raise ValueError("pytree structure differs from the template "
                             "this Packer was built for")
        chunks: dict[str, list] = {dk: [] for dk in self._sizes}
        big = []
        for leaf, plan in zip(leaves, self._plan):
            if plan[0] == "small":
                chunks[plan[1]].append(jnp.ravel(leaf))
            else:
                big.append(leaf)
        packed = {dk: jnp.concatenate(parts) if len(parts) > 1 else parts[0]
                  for dk, parts in chunks.items()}
        return {"packed": packed, "big": tuple(big)}

    def unpack(self, packed):
        """packed pytree -> params pytree (static slices of the flats)."""
        flats = packed["packed"]
        big = packed["big"]
        leaves = []
        for plan in self._plan:
            if plan[0] == "small":
                _, dk, off, shape = plan
                n = 1
                for s in shape:
                    n *= s
                leaves.append(jax.lax.slice(flats[dk], (off,),
                                            (off + n,)).reshape(shape))
            else:
                leaves.append(big[plan[1]])
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    def map_unpacked(self, fn, packed):
        """pack(fn(unpack(packed))) — run a pytree->pytree hook (e.g. the
        spectral-norm (u, v) refresh) through the unpacked view."""
        return self.pack(fn(self.unpack(packed)))


def adam_state_map(opt_state, fn):
    """Apply ``fn`` (Packer.pack or Packer.unpack) to the params-shaped
    moments (mu, nu) of an optax Adam-family state, leaving counts and
    other states alone. Used to convert optimizer state between the
    canonical (unpacked) checkpoint layout and the packed training layout
    — checkpoints ALWAYS store the canonical layout, so runs with and
    without ``--packed_params`` resume each other freely."""
    def conv(s):
        if hasattr(s, "_fields") and "mu" in s._fields and "nu" in s._fields:
            return s._replace(mu=fn(s.mu), nu=fn(s.nu))
        return s
    return tuple(conv(s) for s in opt_state)
