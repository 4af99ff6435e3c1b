"""CLI entrypoint (the ray-job-submit surface): build → search → merge
end-to-end through `python -m splade_ray` subcommands."""

import json
import subprocess
import sys

import pytest


def _run(*args):
    out = subprocess.run(
        [sys.executable, "-m", "splade_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return [json.loads(l) for l in out.stdout.strip().splitlines() if l.startswith("{")]


@pytest.mark.usefixtures("ray_session")
def test_cli_build_search_merge(web_pages_path, tmp_path):
    idx = str(tmp_path / "idx")
    (summary,) = _run(
        "--set", "shard_size=500", "--set", "num_buckets=16",
        "build", "--input", web_pages_path, "--out", idx,
    )
    assert summary["n_docs"] > 0

    hits = _run(
        "--set", "shard_size=500", "--set", "num_buckets=16",
        "search", "--index", idx, "--query", "w0001 w0093", "-k", "5",
    )
    assert hits and hits[0]["rank"] == 1 and "url" in hits[0]

    merged = str(tmp_path / "merged")
    (msum,) = _run(
        "--set", "shard_size=500", "--set", "num_buckets=16",
        "merge", "--segments", idx, "--out", merged,
    )
    assert msum["n_docs"] == summary["n_docs"]


def test_real_decoder_importable_without_pil():
    """decoder='real' is a working Pillow path behind an import-try: clear
    ImportError here (no codecs in the container); decodes where PIL
    exists."""
    import importlib.util

    import pytest

    from splade_ray.pipelines.multimodal import MediaDecodeStage

    if importlib.util.find_spec("PIL") is None:
        with pytest.raises(ImportError, match="Pillow"):
            MediaDecodeStage(decoder="real")
    else:
        import io

        import numpy as np
        import pyarrow as pa
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.zeros((32, 48, 3), dtype=np.uint8)).save(buf, format="PNG")
        out = MediaDecodeStage(decoder="real")(
            pa.table({"media_id": [0], "payload": pa.array([buf.getvalue()], type=pa.binary())})
        )
        assert out.column("width")[0].as_py() == 48
        assert out.column("height")[0].as_py() == 32


@pytest.mark.usefixtures("ray_session")
def test_cli_curate_resume(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    good = "quick brown fox jumps over lazy dog near old stone bridge the town square today market river garden " * 2
    docs = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(12), type=pa.int64()),
                "text": pa.array([good + f"suffix {i}" for i in range(12)]),
            }
        ),
        docs,
    )
    out = str(tmp_path / "curated")
    (s1,) = _run("curate", "--input", docs, "--out", out, "--partitions", "4")
    assert s1["rows_kept"] > 0 and s1["skipped"] == 0
    (s2,) = _run("curate", "--input", docs, "--out", out, "--partitions", "4")
    assert s2["built"] == 0 and s2["skipped"] == 4
