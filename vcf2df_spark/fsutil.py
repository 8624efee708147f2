"""Driver-side filesystem helpers for in-place warehouse/index mutation.

The staged-rewrite jobs (delete, upsert, ANN forget) remove and swap
directories with local filesystem calls. On a remote warehouse URI
(s3://, hdfs://) a silent ``shutil.rmtree(ignore_errors=True)`` no-op
would leave the deleted blocks on disk with no manifest row — and
``read_warehouse`` lists the blocks tree, not the manifests, so the
"deleted" rows would quietly resurrect (ADVICE r4). Until the mutation
paths speak pyarrow.fs end-to-end, they fail LOUDLY on non-local paths.
"""

from __future__ import annotations

import contextlib
import os
import shutil
from urllib.parse import urlparse


class LockHeldError(RuntimeError):
    """Another mutation holds the exclusive lock (or it cannot be taken)."""


@contextlib.contextmanager
def exclusive_lock(path: str, owner: str, what: str = "mutation"):
    """O_EXCL lock file: the atomic driver-side mutex for in-place
    mutations (warehouse rewrite, index forget/append). A crash leaves
    the lock behind with its owner id; the loud failure tells the
    operator what held it."""
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, owner.encode())
        os.close(fd)
    except FileExistsError:
        try:
            holder = open(path).read().strip()
        except OSError:
            holder = "?"
        raise LockHeldError(
            f"another {what} holds {path} (job '{holder}'); if that job "
            "is dead, remove the lock file and retry"
        ) from None
    except OSError as e:
        raise LockHeldError(f"cannot create lock {path}: {e}") from e
    try:
        yield
    finally:
        with contextlib.suppress(OSError):
            os.unlink(path)


def require_local(path: str, what: str = "path") -> str:
    """Return the local filesystem path, or raise for remote URIs.

    Accepts plain paths and file:// URIs; rejects any other scheme
    (s3/hdfs/abfs/...) because the caller is about to mutate directories
    with os/shutil calls that silently no-op on URIs.
    """
    parsed = urlparse(path)
    if parsed.scheme in ("", "file"):
        return parsed.path if parsed.scheme else path
    raise ValueError(
        f"{what} '{path}' is not a local filesystem path; in-place "
        "mutation (delete/upsert/forget) currently requires a local "
        "warehouse — copy it local or compact to a new local warehouse"
    )


def rmtree_checked(path: str) -> None:
    """Remove a directory tree and VERIFY it is gone (missing is fine)."""
    shutil.rmtree(path, ignore_errors=True)
    if os.path.exists(path):
        raise OSError(f"failed to remove directory: {path}")
