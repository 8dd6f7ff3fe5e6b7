"""Planted ground truth for the ustar header walk (round-10 lesson:
a green oracle can share the implementation's blind spot — the parser
and the oracle here both avoid walking, so the walk itself needs
crafted fixtures). Covers: 0-byte members, non-512-aligned payloads,
directory members (skipped), corrupted header checksums (flagged, not
dropped), and agreement with Python's independent tarfile reader."""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from the_movies_db_spark.operators import multimodal as M


def _tar_bytes(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, data in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_walk_matches_tarfile_reader_on_awkward_sizes():
    members = [
        ("empty.bin", b""),
        ("one.bin", b"x"),
        ("block.bin", b"a" * 512),            # exactly one block
        ("blockplus.bin", b"b" * 513),        # spills into a padded block
        ("odd.bin", b"c" * 1000),
        ("sub/dir/name.bin", b"d" * 37),      # path-bearing member name
    ]
    blob = _tar_bytes(members)
    got = [
        (name, size, data, ok)
        for _, name, size, data, ok in M._walk_ustar(7, blob)
    ]
    assert [(n, s) for n, s, *_ in [(g[0], g[1], g[2]) for g in got]] == [
        (n, len(d)) for n, d in members
    ]
    assert all(ok for *_, ok in got)
    assert [g[2] for g in got] == [d for _, d in members]
    # independent reference: Python's tarfile reader sees the same members
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        ref = [(m.name, m.size) for m in tf.getmembers()]
    assert ref == [(g[0], g[1]) for g in got]


def test_walk_skips_directory_members():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo(name="folder/")
        d.type = tarfile.DIRTYPE
        d.mtime = 0
        tf.addfile(d)
        f = tarfile.TarInfo(name="folder/file.bin")
        f.size = 5
        f.mtime = 0
        tf.addfile(f, io.BytesIO(b"hello"))
    got = list(M._walk_ustar(0, buf.getvalue()))
    assert [(g[1], g[2]) for g in got] == [("folder/file.bin", 5)]


def test_walk_flags_corrupted_checksum_without_derailing():
    members = [("a.bin", b"p" * 100), ("b.bin", b"q" * 200)]
    blob = bytearray(_tar_bytes(members))
    # corrupt one NAME byte of the FIRST header (checksum now stale);
    # size field untouched, so the walk still advances correctly
    assert blob[0:1] == b"a"
    blob[0:1] = b"z"
    got = list(M._walk_ustar(0, bytes(blob)))
    assert [(g[1], g[4]) for g in got] == [("z.bin", False), ("b.bin", True)]
    assert got[1][3] == b"q" * 200  # second member unharmed


def test_pack_parse_round_trip_in_spark(spark):
    rows = [
        (0, "000000000001.txt", b"alpha"),
        (0, "000000000003.txt", b""),
        (1, "000000000002.txt", b"z" * 700),
    ]
    df = spark.createDataFrame(
        rows, "shard_id long, member_name string, payload binary"
    )
    out = {
        (r.shard_id, r.member_name): (r.n_bytes, bytes(r.payload), r.cksum_ok)
        for r in M.parse_tar_shards(M.pack_tar_shards(df)).collect()
    }
    assert out == {
        (0, "000000000001.txt"): (5, b"alpha", True),
        (0, "000000000003.txt"): (0, b"", True),
        (1, "000000000002.txt"): (700, b"z" * 700, True),
    }


def test_pack_is_deterministic_across_input_order(spark):
    rows = [
        (0, "b.txt", b"bb"),
        (0, "a.txt", b"aa"),
        (0, "c.txt", b"cc"),
    ]
    a = spark.createDataFrame(
        rows, "shard_id long, member_name string, payload binary"
    )
    b = spark.createDataFrame(
        list(reversed(rows)), "shard_id long, member_name string, payload binary"
    )
    ta = bytes(M.pack_tar_shards(a).collect()[0].tar)
    tb = bytes(M.pack_tar_shards(b).collect()[0].tar)
    assert ta == tb
    names = [g[1] for g in M._walk_ustar(0, ta)]
    assert names == ["a.txt", "b.txt", "c.txt"]
