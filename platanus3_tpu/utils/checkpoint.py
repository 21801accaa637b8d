"""Stage checkpointing / resume.

The reference recomputes everything from FASTA on every run (SURVEY.md §5:
checkpoint/resume absent).  Here the pipeline's natural stage boundaries
(counts -> filter+seeds -> graph -> coverage -> GFA, reference
``src/Assemble.cpp:9-26``) are checkpoint points: each stage's output
arrays are written as one ``.npz`` per stage plus a small manifest keyed
by a digest of the inputs+config, so a re-run with identical inputs skips
straight to the first missing stage.

Arrays are stored host-side via numpy (framework state is plain arrays --
no optimizer/PRNG state to version); orbax is unnecessary weight at this
state size but the layout (one dir per digest, one file per stage) is
compatible with swapping the serializer later.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import numpy as np
import jax

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: Optional[str], digest_parts=()):
        self.dir = directory or None
        self.digest = hashlib.sha256(
            json.dumps([str(p) for p in digest_parts]).encode()
        ).hexdigest()[:16]
        if self.dir:
            os.makedirs(os.path.join(self.dir, self.digest), exist_ok=True)

    def _path(self, stage: str) -> Optional[str]:
        if not self.dir:
            return None
        return os.path.join(self.dir, self.digest, f"{stage}.npz")

    def has(self, stage: str) -> bool:
        p = self._path(stage)
        return bool(p) and os.path.exists(p)

    def save(self, stage: str, **arrays):
        p = self._path(stage)
        if not p:
            return
        np.savez_compressed(
            p + ".tmp.npz",
            **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(p + ".tmp.npz", p)
        # Fault-injection hook (SURVEY.md §5 failure recovery): kill the
        # PROCESS -- not an exception a caller could catch -- right after
        # this stage's checkpoint lands, so tests can prove a real crash
        # mid-pipeline resumes to identical output.  Saves are atomic
        # (write-then-rename above), so dying here never leaves a torn
        # file.
        if os.environ.get("P3_FAULT_AFTER") == stage:
            os._exit(137)

    def load(self, stage: str):
        p = self._path(stage)
        if not p or not os.path.exists(p):
            return None
        with np.load(p) as z:
            return {k: z[k] for k in z.files}

    def save_pytree(self, stage: str, tree):
        leaves, treedef = jax.tree.flatten(tree)
        self.save(stage, **{f"leaf{i}": np.asarray(x)
                            for i, x in enumerate(leaves)})

    def load_pytree(self, stage: str, example_tree):
        d = self.load(stage)
        if d is None:
            return None
        leaves, treedef = jax.tree.flatten(example_tree)
        new = [d[f"leaf{i}"] for i in range(len(leaves))]
        return jax.tree.unflatten(treedef, new)
