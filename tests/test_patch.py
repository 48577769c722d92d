"""Unified-diff ingestion (sources/patch.py)."""

from __future__ import annotations

from autoextract.sources.patch import build_patch, parse_patch, patch_hunks


def test_hunks_counts_and_paths():
    rows = parse_patch(build_patch([
        ("src/a.py", "src/a.py",
         [(10, 10, [(" ", "c1"), ("-", "old"), ("+", "new"), (" ", "c2")]),
          (30, 31, [("+", "added only")])]),
        (None, "new.txt", [(0, 1, [("+", "hello"), ("+", "world")])]),
        ("gone.txt", None, [(1, 0, [("-", "bye")])]),
        ("img.png", "img.png", "binary"),
    ]))
    assert [(r["file_idx"], r["hunk_idx"]) for r in rows] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (3, None)]
    h = rows[0]
    assert (h["old_start"], h["old_count"], h["new_start"],
            h["new_count"]) == (10, 3, 10, 3)
    assert (h["n_added"], h["n_deleted"]) == (1, 1)
    assert h["body"] == " c1\n-old\n+new\n c2"
    # add: old side is /dev/null → NULL
    assert rows[2]["old_path"] is None and rows[2]["new_path"] == "new.txt"
    # delete: new side NULL
    assert rows[3]["new_path"] is None
    bin_row = rows[4]
    assert bin_row["is_binary"] and bin_row["hunk_idx"] is None
    assert all(r["valid"] for r in rows)


def test_plain_unified_rename_and_markers():
    plain = (b"--- a/old name.c\t2024-01-01\n+++ b/old name.c\n"
             b"@@ -1 +1 @@\n-x\n+y\n\\ No newline at end of file\n")
    rows = parse_patch(plain)
    assert rows[0]["old_path"] == "a/old name.c".replace("a/", "")
    # count omitted in @@ -1 +1 @@ means 1 per the spec
    assert rows[0]["old_count"] == 1 and rows[0]["new_count"] == 1
    # the no-newline marker rides in the body but is never counted
    assert rows[0]["n_added"] == 1 and rows[0]["n_deleted"] == 1
    assert rows[0]["body"].endswith("\\ No newline at end of file")

    ren = (b"diff --git a/p.py b/q.py\nsimilarity index 96%\n"
           b"rename from p.py\nrename to q.py\n"
           b"--- a/p.py\n+++ b/q.py\n@@ -1,1 +1,1 @@\n-a\n+b\n")
    r = parse_patch(ren)[0]
    assert r["old_path"] == "p.py" and r["new_path"] == "q.py"


def test_malformed_flags_not_fails():
    bad = (b"diff --git a/x b/x\n--- a/x\n+++ b/x\n"
           b"@@ -1,5 +1,5 @@\n ctx\n+add\n")
    rows = parse_patch(bad)
    assert len(rows) == 1 and rows[0]["valid"] is False
    assert parse_patch(b"no diff content at all") == []


def test_kernel(spark):
    good = build_patch([("m.py", "m.py",
                         [(1, 1, [("-", "a"), ("+", "b")])])])
    df = spark.createDataFrame(
        [(1, good), (2, b"plain prose"), (3, None)],
        "doc_id long, payload binary",
    )
    got = patch_hunks(df).collect()
    assert [(r["doc_id"], r["n_added"], r["n_deleted"]) for r in got] == [
        ("1", 1, 1)]
