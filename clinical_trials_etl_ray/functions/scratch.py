"""Cluster-aware scratch directories for demo/query pipelines.

Several ``queries()`` pipelines build a transient lake or index and then
read it from Ray WORKER tasks by path — which requires the scratch root
to be visible to every node. On the single-node bench/test setup the
default (the local tempdir, normally ``/tmp``) is trivially shared; on a
real multi-node cluster set ``CTE_SCRATCH_DIR`` to a cluster-shared
filesystem (NFS mount, fuse-mounted object store, …). This makes the
assumption explicit and configurable instead of silently baked into each
call site (ADVICE r4: textops.py near-dup index under driver-local /tmp).

Durable lakes/indexes created via the CLI take user-supplied paths and
are unaffected.
"""

from __future__ import annotations

import os
import tempfile


def scratch_root() -> str:
    """The scratch root: ``$CTE_SCRATCH_DIR`` if set (must be shared
    across nodes on a multi-node cluster), else the platform tempdir."""
    return os.environ.get("CTE_SCRATCH_DIR") or tempfile.gettempdir()


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under :func:`scratch_root`."""
    root = scratch_root()
    os.makedirs(root, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=root)
