"""DistCp execution parity: bandwidth throttling (ThrottledInputStream
semantics) and runtime chunk claiming (DynamicInputFormat work
stealing). Planning-side parity is covered by the distcp_plan_chunks /
distcp_update_plan oracle queries."""

from __future__ import annotations

import glob
import os
import time

from hops_spark.maintenance import (_throttled_copy, distcp_plan,
                                    distcp_run, distcp_run_dynamic,
                                    list_files)


def _make_tree(root, n_files: int, size: int = 1024) -> None:
    for i in range(n_files):
        sub = os.path.join(root, f"d{i % 3}")
        os.makedirs(sub, exist_ok=True)
        with open(os.path.join(sub, f"f{i}.bin"), "wb") as f:
            f.write(bytes((i + j) % 256 for j in range(size)))


def test_throttled_copy_caps_rate(tmp_path):
    src = tmp_path / "big.bin"
    src.write_bytes(os.urandom(512 * 1024))
    dst = tmp_path / "out.bin"
    t0 = time.monotonic()
    n = _throttled_copy(str(src), str(dst), bandwidth_bps=1024 * 1024)
    elapsed = time.monotonic() - t0
    assert n == 512 * 1024
    assert dst.read_bytes() == src.read_bytes()
    # 512 KiB at 1 MiB/s must take >= ~0.25 s (3rd block waits past 0.25);
    # unthrottled local copy is ~ms, so this proves the cap engaged.
    assert elapsed >= 0.25, f"copy finished in {elapsed:.3f}s — no throttle"


def test_distcp_run_throttled_end_to_end(spark, tmp_path):
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 4, size=2048)
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       str(tmp_path / "dst"), tasks=2)
    assert distcp_run(plan, bandwidth_bps=10 * 1024 * 1024) == 4
    for r in plan.collect():
        assert open(r.dst.removeprefix("file:"), "rb").read() \
            == open(r.src.removeprefix("file:"), "rb").read()


def test_distcp_dynamic_chunks_copy_once_each(spark, tmp_path):
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 12)
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       str(tmp_path / "dst"), tasks=8)
    n = distcp_run_dynamic(plan, str(tmp_path / "claims"), n_workers=3)
    assert n == 12
    claims = glob.glob(str(tmp_path / "claims" / "chunk-*.claim"))
    dones = glob.glob(str(tmp_path / "claims" / "chunk-*.done"))
    assert len(claims) == len(dones) == 8       # every chunk claimed once
    copied = glob.glob(str(tmp_path / "dst" / "**" / "*.bin"),
                       recursive=True)
    assert len(copied) == 12
    for r in plan.collect():
        assert open(r.dst.removeprefix("file:"), "rb").read() \
            == open(r.src.removeprefix("file:"), "rb").read()


def test_distcp_dynamic_steals_from_straggler(spark, tmp_path):
    """Straggler resilience: the worker that grabs chunk 0 sleeps; the
    other workers must claim every remaining chunk meanwhile (the
    DynamicInputFormat guarantee: a slow task strands ONE chunk)."""
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 8)
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       str(tmp_path / "dst"), tasks=6)
    claim_dir = tmp_path / "claims"

    # baseline run (no straggler) to measure fixed job overhead on this
    # box — the overlap bound below must not depend on machine load
    t0 = time.monotonic()
    assert distcp_run_dynamic(plan, str(tmp_path / "claims0"),
                              n_workers=3) == 8
    baseline = time.monotonic() - t0

    SLEEP = 3.0

    def straggle(wid: int, chunk: int) -> None:
        if chunk == 0:
            time.sleep(SLEEP)

    t0 = time.monotonic()
    assert distcp_run_dynamic(plan, str(claim_dir), n_workers=3,
                              on_chunk_start=straggle) == 8
    elapsed = time.monotonic() - t0
    owners = {}
    for path in glob.glob(str(claim_dir / "chunk-*.claim")):
        chunk = int(os.path.basename(path).split("-")[1].split(".")[0])
        owners[chunk] = open(path).read()
    slow_worker = owners[0]
    # the strongest stealing proof: while the straggler slept inside
    # chunk 0, the other workers claimed EVERY remaining chunk — the
    # slow worker ends the job owning only its one stuck chunk.
    assert {c for c, w in owners.items() if w == slow_worker} == {0}, \
        f"straggler kept extra chunks (owners={owners})"
    # the straggler held exactly chunk 0 for its one sleep; everything
    # else finished concurrently — so the whole job costs ~baseline +
    # ONE sleep. Without stealing, the slow worker's remaining claims
    # would serialize after the sleep (>= baseline + 2 sleeps).
    assert elapsed < baseline + 2 * SLEEP, \
        f"work stealing didn't overlap: {elapsed:.1f}s (baseline {baseline:.1f}s)"


def test_distcp_plan_src_root_with_file_scheme(spark, tmp_path):
    """ADVICE r4: src_root spelled with the 'file:' scheme (as
    binaryFile listings print it) must yield the same dst paths as the
    bare-path spelling — the prefix offset normalizes both sides."""
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 3)
    listing = list_files(spark, str(srcroot))
    bare = {r.src: r.dst for r in
            distcp_plan(listing, str(srcroot), "/dst", tasks=2).collect()}
    schemed = {r.src: r.dst for r in
               distcp_plan(listing, "file:" + str(srcroot), "/dst",
                           tasks=2).collect()}
    assert bare == schemed
    assert all(d.startswith("/dst/") for d in bare.values())


def test_distcp_atomic_success_is_all_or_nothing(spark, tmp_path):
    """-atomic commit (CopyCommitter.java:67): files stage under the
    work root; the final dst appears via ONE rename with every file
    complete, and the staging dir is gone afterwards."""
    import pytest
    from hops_spark.maintenance import distcp_run_atomic

    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 6, size=1024)
    dst = str(tmp_path / "dst")
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       dst, tasks=3)
    n = distcp_run_atomic(plan, dst)
    assert n == 6
    assert not os.path.exists(dst + ".distcp.tmp")   # staging promoted away
    for r in plan.collect():
        assert open(r.dst.removeprefix("file:"), "rb").read() \
            == open(r.src.removeprefix("file:"), "rb").read()
    # the reference refuses -atomic onto an existing target
    with pytest.raises(ValueError, match="already exists"):
        distcp_run_atomic(plan, dst)


def test_distcp_atomic_failure_leaves_dst_untouched(spark, tmp_path):
    """Injected mid-copy failure (one source path missing): the copy
    job fails, the staging tree is deleted, and the final dst never
    comes into existence — no partial tree visible to readers."""
    import pytest
    from pyspark.sql import functions as SF
    from hops_spark.maintenance import distcp_run_atomic

    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 6, size=1024)
    dst = str(tmp_path / "dst")
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       dst, tasks=3)
    poisoned = plan.unionByName(
        plan.limit(1).select(
            SF.lit(f"file:{srcroot}/d9/does-not-exist.bin").alias("src"),
            SF.lit(1024).alias("size"),
            SF.concat(SF.lit(dst), SF.lit("/d9/does-not-exist.bin")).alias("dst"),
            SF.lit(0).alias("chunk")))
    with pytest.raises(Exception):
        distcp_run_atomic(poisoned, dst)
    assert not os.path.exists(dst), "partial dst visible after failed -atomic"
    assert not os.path.exists(dst + ".distcp.tmp"), "staging dir leaked"


def test_distcp_atomic_plan_stages_under_work_root(spark, tmp_path):
    from hops_spark.maintenance import distcp_atomic_plan

    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 4, size=256)
    dst = str(tmp_path / "dst")
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       dst, tasks=2)
    staged = distcp_atomic_plan(plan, dst)
    for r in staged.collect():
        assert r.dst.startswith(dst + ".distcp.tmp/"), r.dst
        assert r.final_dst.startswith(dst + "/"), r.final_dst
        assert r.dst.removeprefix(dst + ".distcp.tmp") \
            == r.final_dst.removeprefix(dst)


def test_distcp_atomic_plan_normalizes_file_scheme(spark, tmp_path):
    """Round-6 ADVICE regression: a 'file:'-prefixed dst column (the
    binaryFile listing style) and/or a 'file:'-prefixed dst_root must
    slice the relative path correctly — every combination yields the
    same staged tree as the bare-path plan."""
    from pyspark.sql import functions as SF
    from hops_spark.maintenance import distcp_atomic_plan

    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 4, size=256)
    dst = str(tmp_path / "dst")
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       dst, tasks=2)
    schemed = plan.withColumn("dst", SF.concat(SF.lit("file:"), "dst"))
    want = sorted(r.dst for r in distcp_atomic_plan(plan, dst).collect())
    for p, root in ((schemed, dst), (plan, "file:" + dst),
                    (schemed, "file:" + dst)):
        got = sorted(r.dst for r in distcp_atomic_plan(p, root).collect())
        assert got == want, (root, got[:2], want[:2])
    assert all(d.startswith(dst + ".distcp.tmp/") for d in want)


# --- -p attribute preservation (CopyCommitter / DistCpUtils.preserve) ----


def _set_attrs(path: str, mode: int, mtime_s: int) -> None:
    os.chmod(path, mode)
    os.utime(path, ns=(mtime_s * 10**9 + 123, mtime_s * 10**9 + 456))


def test_preserve_attrs_survive_atomic_promote(spark, tmp_path):
    """-p pt composed with -atomic: mode and exact ns-precision times
    are applied to the STAGED files and ride through the promote
    rename untouched."""
    from hops_spark.maintenance import distcp_run_atomic, stat_listing
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 6, size=256)
    files = sorted(glob.glob(str(srcroot / "**" / "*.bin"), recursive=True))
    for i, p in enumerate(files):
        _set_attrs(p, 0o640 if i % 2 else 0o755, 1_500_000_000 + i)
    dst = str(tmp_path / "dst")
    plan = distcp_plan(stat_listing(list_files(spark, str(srcroot))),
                       str(srcroot), dst, tasks=2)
    assert distcp_run_atomic(plan, dst, preserve="pt") == 6
    for i, p in enumerate(files):
        q = dst + p[len(str(srcroot)):]
        s, d = os.stat(p), os.stat(q)
        assert (d.st_mode & 0o7777) == (s.st_mode & 0o7777)
        assert d.st_mtime_ns == s.st_mtime_ns
        # the source's own atime was bumped by the copy READ after the
        # listing captured it — the preserved value is the listing-time
        # one we set, exactly (ns precision)
        assert d.st_atime_ns == (1_500_000_000 + i) * 10**9 + 123


def test_preserve_owner_when_root(spark, tmp_path):
    """-p ug: uid/gid applied when the process may chown (root in this
    container); verifies the chown path executes, not just the flags."""
    import pytest
    from hops_spark.maintenance import distcp_run, stat_listing
    if os.geteuid() != 0:
        pytest.skip("chown needs root")
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 2, size=64)
    files = sorted(glob.glob(str(srcroot / "**" / "*.bin"), recursive=True))
    os.chown(files[0], 12345, 54321)
    plan = distcp_plan(stat_listing(list_files(spark, str(srcroot))),
                       str(srcroot), str(tmp_path / "dst"), tasks=1)
    assert distcp_run(plan, preserve="ug") == 2
    d = os.stat(str(tmp_path / "dst") + files[0][len(str(srcroot)):])
    assert (d.st_uid, d.st_gid) == (12345, 54321)


def test_stat_listing_restat_replaces_attr_columns(spark, tmp_path):
    """Round-7 ADVICE regression: re-statting an already-statted
    listing (the attr-refresh shape) must REPLACE the five attribute
    columns, not append duplicates that fail at analysis — and the
    refreshed values must reflect the filesystem now."""
    from hops_spark.maintenance import stat_listing
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 2, size=64)
    files = sorted(glob.glob(str(srcroot / "**" / "*.bin"), recursive=True))
    once = stat_listing(list_files(spark, str(srcroot)))
    base_cols = once.columns
    os.chmod(files[0], 0o600)                # drift between the stats
    twice = stat_listing(once)
    assert twice.columns == base_cols        # no duplicate columns
    rows = {r.src.removeprefix("file:"): r for r in twice.collect()}
    assert rows[files[0]].mode == 0o600      # values are re-read


def test_preserve_rejects_hdfs_only_flags_and_bare_plans(spark, tmp_path):
    import pytest
    from hops_spark.maintenance import distcp_run
    srcroot = tmp_path / "src"
    _make_tree(str(srcroot), 1)
    plan = distcp_plan(list_files(spark, str(srcroot)), str(srcroot),
                       str(tmp_path / "dst"), tasks=1)
    with pytest.raises(ValueError, match="HDFS-only"):
        distcp_run(plan, preserve="rb")
    with pytest.raises(ValueError, match="stat_listing"):
        distcp_run(plan, preserve="pt")   # plan lacks attr columns


def test_update_repairs_drifted_attributes_only(spark, tmp_path):
    """-update -p metadata repair: after a copy, drift mode on one dst
    file and mtime on another; attr_repair_plan emits EXACTLY those
    two rows (up-to-date files produce none) and attr_repair_run
    restores the source attributes."""
    from hops_spark.maintenance import (attr_repair_plan, attr_repair_run,
                                        distcp_run, stat_listing)
    srcroot, dstroot = str(tmp_path / "src"), str(tmp_path / "dst")
    _make_tree(srcroot, 6, size=128)
    files = sorted(glob.glob(srcroot + "/**/*.bin", recursive=True))
    for i, p in enumerate(files):
        _set_attrs(p, 0o644, 1_600_000_000 + i)
    plan = distcp_plan(stat_listing(list_files(spark, srcroot)),
                       srcroot, dstroot, tasks=2)
    distcp_run(plan, preserve="pt")
    drift_mode = dstroot + files[1][len(srcroot):]
    drift_time = dstroot + files[4][len(srcroot):]
    os.chmod(drift_mode, 0o600)
    os.utime(drift_time, ns=(0, 0))
    rep = attr_repair_plan(stat_listing(list_files(spark, srcroot)),
                           stat_listing(list_files(spark, dstroot)),
                           srcroot, dstroot, flags="pt")
    rows = {r.dst.removeprefix("file:"): r for r in rep.collect()}
    assert set(rows) == {drift_mode, drift_time}
    assert rows[drift_mode].fix_mode and not rows[drift_mode].fix_times
    assert rows[drift_time].fix_times and not rows[drift_time].fix_mode
    assert attr_repair_run(rep, flags="pt") == 2
    for i, p in enumerate(files):
        q = dstroot + p[len(srcroot):]
        s, d = os.stat(p), os.stat(q)
        assert (d.st_mode & 0o7777) == (s.st_mode & 0o7777)
        assert d.st_mtime_ns == s.st_mtime_ns


def test_preserve_owner_then_mode_keeps_setuid(spark, tmp_path):
    """chown clears setuid/setgid on Linux, so preservation must apply
    owner BEFORE mode (the DistCpUtils.preserve order) — a 04755
    source file keeps its setuid bit through -p pug copy AND through
    an owner-drift repair."""
    import pytest
    from hops_spark.maintenance import (attr_repair_plan, attr_repair_run,
                                        distcp_run, stat_listing)
    if os.geteuid() != 0:
        pytest.skip("chown needs root")
    srcroot, dstroot = str(tmp_path / "src"), str(tmp_path / "dst")
    _make_tree(srcroot, 1, size=64)
    f = glob.glob(srcroot + "/**/*.bin", recursive=True)[0]
    os.chown(f, 1234, 1234)
    os.chmod(f, 0o4755)           # chmod AFTER chown (chown clears suid)
    plan = distcp_plan(stat_listing(list_files(spark, srcroot)),
                       srcroot, dstroot, tasks=1)
    assert distcp_run(plan, preserve="pug") == 1
    q = dstroot + f[len(srcroot):]
    assert os.stat(q).st_mode & 0o7777 == 0o4755
    assert (os.stat(q).st_uid, os.stat(q).st_gid) == (1234, 1234)
    # repair path: drift ONLY the owner; the fix must re-assert mode
    # after its chown, or the repair itself would strip setuid
    os.chown(q, 0, 0)
    os.chmod(q, 0o4755)
    rep = attr_repair_plan(stat_listing(list_files(spark, srcroot)),
                           stat_listing(list_files(spark, dstroot)),
                           srcroot, dstroot, flags="pug")
    rows = rep.collect()
    assert len(rows) == 1 and rows[0].fix_owner and not rows[0].fix_mode
    attr_repair_run(rep, flags="pug")
    assert os.stat(q).st_mode & 0o7777 == 0o4755
    assert (os.stat(q).st_uid, os.stat(q).st_gid) == (1234, 1234)
