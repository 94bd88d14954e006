"""CSV/JSON readers and the resumable hive-partitioned parquet sink."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_read_csv_and_json(ray_session, tmp_path):
    from kamae_ray.sources.io import read_csv_clean, read_json_clean

    rows = [{"a": i, "b": f"s{i}", "c": i * 0.5} for i in range(50)]
    csv_p = tmp_path / "t.csv"
    csv_p.write_text("a,b,c\n" + "\n".join(f'{r["a"]},{r["b"]},{r["c"]}' for r in rows))
    js_p = tmp_path / "t.jsonl"
    js_p.write_text("\n".join(json.dumps(r) for r in rows))

    got_csv = read_csv_clean(str(csv_p), columns=["a", "c"]).to_pandas().sort_values("a")
    assert list(got_csv.columns) == ["a", "c"] and len(got_csv) == 50
    assert got_csv["a"].tolist() == list(range(50))

    got_js = read_json_clean(str(js_p)).to_pandas().sort_values("a")
    assert len(got_js) == 50 and got_js["b"].iloc[3] == "s3"


def _part_table(vals):
    n = len(vals)
    return pa.table({
        "k": pa.array(vals, pa.string()),
        "v": pa.array(range(n), pa.int64()),
    })


def test_write_partitioned_resume(ray_session, tmp_path):
    import ray

    from kamae_ray.sources.io import write_partitioned

    root = str(tmp_path / "out")
    t1 = _part_table(["x"] * 10 + ["y"] * 5)
    r1 = write_partitioned(ray.data.from_arrow(t1), root, "k")
    assert r1["written"] == ["x", "y"] and r1["skipped"] == []
    assert os.path.exists(os.path.join(root, "k=x", "_SUCCESS"))

    # resume with a superset: finished partitions are skipped (their files
    # untouched), the new partition is written
    files_x_before = sorted(os.listdir(os.path.join(root, "k=x")))
    t2 = _part_table(["x"] * 99 + ["y"] * 99 + ["z"] * 7)
    r2 = write_partitioned(ray.data.from_arrow(t2), root, "k")
    assert r2["skipped"] == ["x", "y"] and r2["written"] == ["z"]
    assert sorted(os.listdir(os.path.join(root, "k=x"))) == files_x_before

    back = pq.read_table(root)
    counts = dict(zip(*[c.to_pylist() for c in (
        back.group_by("k").aggregate([("v", "count")]).column("k"),
        back.group_by("k").aggregate([("v", "count")]).column("v_count"),
    )]))
    assert counts == {"x": 10, "y": 5, "z": 7}


def test_write_partitioned_cleans_torn_partition(ray_session, tmp_path):
    import ray

    from kamae_ray.sources.io import write_partitioned

    root = str(tmp_path / "out2")
    write_partitioned(ray.data.from_arrow(_part_table(["a"] * 4)), root, "k")
    # simulate a killed run: partition dir with data but NO _SUCCESS marker
    torn = os.path.join(root, "k=b")
    os.makedirs(torn)
    pq.write_table(_part_table(["b"] * 3), os.path.join(torn, "partial.parquet"))
    write_partitioned(ray.data.from_arrow(_part_table(["b"] * 6)), root, "k")
    back = pq.read_table(root)
    vals = back.column("k").to_pylist()
    assert vals.count("b") == 6  # torn files replaced, not duplicated
    assert vals.count("a") == 4


def test_write_partitioned_overwrite_mode(ray_session, tmp_path):
    """skip_existing=False is full-overwrite: completed partitions are
    replaced, never appended to."""
    import ray

    from kamae_ray.sources.io import write_partitioned

    root = str(tmp_path / "ow")
    write_partitioned(ray.data.from_arrow(_part_table(["a"] * 5)), root, "k")
    write_partitioned(ray.data.from_arrow(_part_table(["a"] * 3)), root, "k",
                      skip_existing=False)
    back = pq.read_table(root)
    assert back.num_rows == 3  # replaced, not 5 + 3
