"""Checkpoint/resume (north rule): stage skip, per-shard rebuild, and
byte-identity of the resumed index (SURVEY.md §5.3)."""

import json
import os
import shutil

from splade_ray.pipelines.build import IndexBuilder, build_index


def _file_bytes(path):
    with open(path, "rb") as f:
        return f.read()


def test_full_resume_skips_everything(built_index, web_pages_path, small_cfg):
    index_dir, cfg = built_index
    builder = IndexBuilder(index_dir, cfg)
    summary = builder.build(web_pages_path)
    assert summary["timings"] == {}  # no stage re-ran


def test_shard_rebuild_is_byte_identical(built_index, web_pages_path, tmp_path):
    index_dir, cfg = built_index
    # copy the index so we don't disturb the session fixture
    work = str(tmp_path / "idx")
    shutil.copytree(index_dir, work)

    victim = os.path.join(work, "postings", "shard-00001.postings.parquet")
    original = _file_bytes(victim)
    os.remove(victim)
    os.remove(os.path.join(work, "postings", "_SUCCESS.json"))

    build_index(web_pages_path, work, cfg)

    lineage = json.load(open(os.path.join(work, "postings", "_LINEAGE.json")))
    skipped = {s["part_id"]: s["skipped"] for s in lineage["shards"]}
    assert skipped == {0: True, 1: False, 2: True, 3: True}
    assert _file_bytes(victim) == original  # deterministic rebuild


def test_config_change_invalidates(built_index, web_pages_path, small_cfg, tmp_path):
    import dataclasses

    index_dir, cfg = built_index
    work = str(tmp_path / "idx2")
    shutil.copytree(index_dir, work)
    new_cfg = dataclasses.replace(cfg, k1=2.0)
    builder = IndexBuilder(work, new_cfg)
    # stage guards must treat every stage as stale under the new config
    assert builder.cfg_hash != IndexBuilder(work, cfg).cfg_hash
    from splade_ray.state.lineage import StageGuard

    guard = StageGuard(os.path.join(work, "doc_terms"), builder.cfg_hash)
    assert guard.done() is None
