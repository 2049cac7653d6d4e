"""Slow, direct numpy/Python implementation of the octree semantics — the test oracle.

This re-states the REFERENCE's behavioral contract (progressive_octree_voxels.cu) in
plain Python so the vectorized TPU builder can be cross-checked against it on small
inputs. It is intentionally naive; never used in the engine.

Semantics encoded (with reference citations):
  - batch-mode processing, like one addBatch() call (voxels.cu:700-780): first count the
    whole batch and run the split cascade (expand(), :385-414), then sample voxels,
    then insert points into the post-split tree (:540-640).
  - descent by quantized-coordinate bits, childIndex=(x<<2)|(y<<1)|z (voxels.cu:169-187)
  - persistent per-leaf counter; a leaf splits when counter crosses MAX_POINTS_PER_NODE
    (voxels.cu:203-218); all 8 children are created (voxels.cu:317-343); the split
    node's stored points redistribute into children (re-counting there) and cascades
    continue (:253-289)
  - a voxel is sampled at every inner node on a point's path plus the root, first point
    in a 128^3 cell wins (voxels.cu:50-119; the root owns a grid from reset.cu:69);
    redistributed points sample the newly-inner node's fresh grid
  - nodes at MAX_DEPTH never split (deviation from the reference, which would create
    unreachable children past MAX_DEPTH; we clamp instead)

Note on voxel colors: within a batch the reference's "first" writer is a nondeterministic
atomic race; the TPU builder deterministically picks the Morton-order-first point. The
oracle records the set of occupied cells plus one sample color; tests compare cell sets
and positions, not racy colors.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from . import constants as C


@dataclasses.dataclass
class RefNode:
    level: int
    x: int
    y: int
    z: int
    children: list | None = None          # list of 8 RefNode or None
    counter: int = 0
    points: list = dataclasses.field(default_factory=list)   # (xyz, rgba, q)
    voxels: dict = dataclasses.field(default_factory=dict)   # cell -> rgba

    @property
    def is_leaf(self):
        return self.children is None


class RefOctree:
    def __init__(self, box_min, cube_size, max_points=C.MAX_POINTS_PER_NODE,
                 max_depth=C.MAX_DEPTH):
        self.box_min = np.asarray(box_min, np.float32)
        self.cube_size = np.float32(cube_size)
        self.max_points = max_points
        self.max_depth = max_depth
        self.root = RefNode(0, 0, 0, 0)

    # --- coordinate helpers (identical math to the TPU ops/morton.py) ---
    def quantize(self, p):
        g = np.float32(C.FULL_GRID_SIZE)
        q = np.floor((np.asarray(p, np.float32) - self.box_min)
                     / self.cube_size * g).astype(np.int64)
        return np.clip(q, 0, C.FULL_GRID_SIZE - 1)

    @staticmethod
    def _octant(q, level):
        shift = (C.FULL_GRID_BITS - 1) - level
        return int((((q[0] >> shift) & 1) << 2) | (((q[1] >> shift) & 1) << 1)
                   | ((q[2] >> shift) & 1))

    @staticmethod
    def _cell(q, level):
        shift = (C.MAX_DEPTH + 1) - level
        cx = (q[0] >> shift) & (C.GRID_SIZE - 1)
        cy = (q[1] >> shift) & (C.GRID_SIZE - 1)
        cz = (q[2] >> shift) & (C.GRID_SIZE - 1)
        return int((cx << 14) | (cy << 7) | cz)

    def _descend(self, q):
        node = self.root
        while not node.is_leaf:
            node = node.children[self._octant(q, node.level)]
        return node

    # --- batch pipeline ---
    def add_batch(self, xyz, rgba):
        xyz = np.asarray(xyz, np.float32)
        rgba = np.asarray(rgba)
        batch = [(xyz[i], int(rgba[i]), self.quantize(xyz[i]))
                 for i in range(len(xyz))]

        # phase 1: counting + split cascade
        newly = [(q, None) for (_p, _c, q) in batch]   # (q, leaf-or-None)
        assigned = {}
        for i, (q, _l) in enumerate(newly):
            leaf = self._descend(q)
            leaf.counter += 1
            assigned[i] = leaf
        while True:
            split_set = [n for n in self.all_nodes()
                         if n.is_leaf and n.counter > self.max_points
                         and n.level < self.max_depth]
            if not split_set:
                break
            for node in split_set:
                node.children = [
                    RefNode(node.level + 1, 2 * node.x + ((o >> 2) & 1),
                            2 * node.y + ((o >> 1) & 1), 2 * node.z + (o & 1))
                    for o in range(8)
                ]
                stored = node.points
                node.points = []
                for (p, c, q) in stored:
                    # redistributed stored points voxel-sample the newly inner node
                    node.voxels.setdefault(self._cell(q, node.level), c)
                    child = node.children[self._octant(q, node.level)]
                    child.counter += 1
                    child.points.append((p, c, q))
                # batch points assigned here re-count into the children
                for i, leaf in list(assigned.items()):
                    if leaf is node:
                        (_p, _c, q) = batch[i]
                        child = node.children[self._octant(q, node.level)]
                        child.counter += 1
                        assigned[i] = child

        # phase 2: voxel sampling of the batch along each path (inner nodes + root)
        for (p, c, q) in batch:
            node = self.root
            level = 0
            while True:
                if (not node.is_leaf) or node is self.root:
                    node.voxels.setdefault(self._cell(q, level), c)
                if node.is_leaf:
                    break
                node = node.children[self._octant(q, level)]
                level += 1

        # phase 3: insert batch points into the post-split tree
        for (p, c, q) in batch:
            self._descend(q).points.append((p, c, q))

    # --- inspection helpers ---
    def all_nodes(self):
        out = []
        stack = [self.root]
        while stack:
            n = stack.pop()
            out.append(n)
            if not n.is_leaf:
                stack.extend(n.children)
        return out

    def summary(self):
        nodes = self.all_nodes()
        return dict(
            num_nodes=len(nodes),
            num_leaves=sum(n.is_leaf for n in nodes),
            num_points=sum(len(n.points) for n in nodes),
            num_voxels=sum(len(n.voxels) for n in nodes),
        )

    def node_map(self):
        """dict (level, x, y, z) -> RefNode for comparison with the dense builder."""
        return {(n.level, n.x, n.y, n.z): n for n in self.all_nodes()}
