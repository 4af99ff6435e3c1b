"""Index snapshot / restore — the ES snapshot-repository lifecycle.

The reference persists an index as a directory of array shards and
reloads it (``/root/reference/src/indexing/sparse_index.py`` save/load);
the operational layer here is modeled on the Lucene/Elasticsearch
snapshot repository instead: a content-addressed blob store plus named
snapshot manifests, INCREMENTAL across snapshots (index files are
immutable once written, so a blob whose sha256 already exists in the
repository is never re-uploaded — the ES segment-reuse contract), and
sha256-verified on restore so silent repository corruption fails loudly.

Scale shape: the manifest is file-granular, so on a multi-node cluster
each shard owner snapshots/restores its own postings files in parallel
(an embarrassingly parallel map over the file list — no coordinator
byte traffic beyond the manifest itself); the driver-side loop below is
the single-node degenerate case of that map.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

BLOB_DIR = "blobs"


def _sha256(path: str, bufsize: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(bufsize):
            h.update(chunk)
    return h.hexdigest()


def _excluded(rel: str, exclude: tuple[str, ...]) -> bool:
    return any(rel == e or rel.startswith(e + os.sep) for e in exclude)


def snapshot_index(
    index_dir: str,
    repo_dir: str,
    name: str,
    exclude: tuple[str, ...] = ("corpus_input.parquet",),
) -> dict:
    """Snapshot ``index_dir`` into the repository as ``name``.

    Source data (``corpus_input.parquet``) is excluded by default — a
    snapshot captures the INDEX, as in ES.  Returns the manifest (also
    written as ``snap-{name}.json``); ``reused_blobs`` counts files that
    were already present from earlier snapshots (incremental saving).
    """
    blob_root = os.path.join(repo_dir, BLOB_DIR)
    os.makedirs(blob_root, exist_ok=True)
    files: dict[str, dict] = {}
    reused = 0
    for root, dirs, names in os.walk(index_dir):
        rel_root = os.path.relpath(root, index_dir)
        if rel_root != "." and _excluded(rel_root, exclude):
            dirs[:] = []
            continue
        for n in sorted(names):
            rel = os.path.normpath(os.path.join(rel_root, n))
            if _excluded(rel, exclude):
                continue
            p = os.path.join(root, n)
            digest = _sha256(p)
            blob = os.path.join(blob_root, digest)
            if os.path.exists(blob):
                reused += 1
            else:
                tmp = blob + ".tmp"
                shutil.copyfile(p, tmp)
                os.replace(tmp, blob)
            files[rel] = {"sha256": digest, "size": os.path.getsize(p)}
    manifest = {"name": name, "files": files, "n_files": len(files), "reused_blobs": reused}
    mpath = os.path.join(repo_dir, f"snap-{name}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, mpath)
    return manifest


def restore_index(repo_dir: str, name: str, dest_dir: str) -> dict:
    """Restore snapshot ``name`` into ``dest_dir``, verifying every
    blob's sha256 before it lands (corrupt repositories fail loudly,
    never serve).  Returns the manifest."""
    with open(os.path.join(repo_dir, f"snap-{name}.json")) as f:
        manifest = json.load(f)
    blob_root = os.path.join(repo_dir, BLOB_DIR)
    for rel, meta in manifest["files"].items():
        blob = os.path.join(blob_root, meta["sha256"])
        if _sha256(blob) != meta["sha256"]:
            raise IOError(f"snapshot blob corrupt for {rel}: {meta['sha256']}")
        dest = os.path.join(dest_dir, rel)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        tmp = dest + ".tmp"
        shutil.copyfile(blob, tmp)
        os.replace(tmp, dest)
    return manifest
