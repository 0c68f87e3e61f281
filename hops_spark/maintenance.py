"""Maintenance jobs (SURVEY.md §2.1 DistCp/DistCh, §2.10 erasure coding).

- ``distcp_plan`` / ``distcp_run``: parallel copy as a listing DataFrame
  partitioned into copy tasks executed with foreachPartition (the
  reference's chunked map-only copy: DistCp.java, CopyMapper.java:48),
  with optional per-task bandwidth throttling
  (util/ThrottledInputStream.java:36 semantics).
- ``distcp_run_dynamic``: runtime chunk claiming — DynamicInputFormat
  parity (mapred/lib/DynamicInputFormat.java:51): more chunks than
  workers, atomic create-once claims on a shared directory, so a
  straggler strands one chunk instead of 1/n of the copy.
- ``distcp_atomic_plan`` / ``distcp_run_atomic``: the -atomic commit
  protocol (mapred/CopyCommitter.java:67): stage under a work root,
  promote the whole tree with one rename on success, delete the
  staging tree on failure — all-or-nothing dst visibility.
- ``distch_plan``: parallel chmod/chown planning table (DistCh).
- ``xor_parity`` / ``rs_encode``: erasure-coding kernels
  (hops-erasure-coding-project ReedSolomonCode.java:27-128 semantics)
  as Pandas-vectorized batch jobs over block DataFrames. The RS kernel
  is a standard GF(2^8) Vandermonde implementation written from the
  public algorithm (NOT ported from the reference)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def list_files(spark: SparkSession, root: str) -> DataFrame:
    """Copy listing (SimpleCopyListing parity): one row per file with
    size — built with Spark's binaryFile source metadata (no payload
    read: content column pruned away)."""
    df = spark.read.format("binaryFile").option("recursiveFileLookup", "true").load(root)
    return df.select(F.col("path").alias("src"), F.col("length").alias("size"))


def distcp_plan(listing: DataFrame, src_root: str, dst_root: str,
                tasks: int = 64) -> DataFrame:
    """Assign files to copy chunks balanced by cumulative size (the
    DistCp 'uniform size' strategy): global size-desc rank (two-phase,
    no single-partition window — listings reach 10^8 files at 100 TB),
    then round-robin by rank — greedy LPT-ish without a driver loop."""
    from hops_spark.ops.sort import total_order_rank
    ranked = total_order_rank(
        listing.withColumn("_neg_size", -F.col("size")),
        "_neg_size", "src", rank_col="_rank")
    # binaryFile listings carry a URI scheme ("file:/...") the caller's
    # src_root may or may not include — strip it from BOTH sides so the
    # prefix-swap offset is right regardless of how either was spelled.
    root = src_root.removeprefix("file:")
    rel = F.expr(
        f"substring(regexp_replace(src, '^file:', ''), {len(root) + 1})")
    return (ranked
            .withColumn("dst", F.concat(F.lit(dst_root), rel))
            .withColumn("chunk", F.pmod(F.col("_rank"), F.lit(tasks)))
            .drop("_neg_size", "_rank"))


# DistCp -p preservation (DistCpOptions.FileAttribute / reference
# hadoop-tools/hadoop-distcp/.../mapred/CopyCommitter.java:67 +
# DistCpUtils.preserve): the flag letters we can honor on a local FS.
# r/b/c/a/x (replication, blocksize, checksum-type, ACLs, xattrs) are
# HDFS-only concepts — requesting them raises rather than silently
# no-oping.
PRESERVE_FLAGS = {"p": "permission", "u": "user", "g": "group",
                  "t": "times"}


def _check_preserve(flags: str) -> str:
    bad = set(flags) - set(PRESERVE_FLAGS)
    if bad:
        raise ValueError(
            f"unsupported -p flags {sorted(bad)}: local-FS preservation "
            f"supports {sorted(PRESERVE_FLAGS)} (r/b/c/a/x are "
            "HDFS-only attributes)")
    return flags


def stat_listing(listing: DataFrame) -> DataFrame:
    """Augment a copy listing with source attributes for -p
    preservation: one os.stat per file inside an Arrow mapInPandas
    batch (metadata-only pass — no payload read, embarrassingly
    parallel over the listing partitions). Adds mode (the 07777
    permission bits), uid, gid, mtime_ns, atime_ns."""
    from pyspark.sql.types import StructField, StructType

    # Re-statting an already-statted listing (e.g. refreshing attrs for
    # attr_repair_plan) must replace the attribute columns, not append
    # duplicates — a duplicate-column schema fails at analysis
    # (round-7 ADVICE).
    attr_cols = ("mode", "uid", "gid", "mtime_ns", "atime_ns")
    listing = listing.drop(*[c for c in attr_cols
                             if c in listing.columns])
    schema = StructType(listing.schema.fields + [
        StructField("mode", T.IntegerType()),
        StructField("uid", T.IntegerType()),
        StructField("gid", T.IntegerType()),
        StructField("mtime_ns", T.LongType()),
        StructField("atime_ns", T.LongType())])

    def add_stats(batches):
        import stat as statmod
        for pdf in batches:
            modes, uids, gids, mts, ats = [], [], [], [], []
            for p in pdf["src"]:
                st = os.stat(p.removeprefix("file:"))
                modes.append(statmod.S_IMODE(st.st_mode))
                uids.append(st.st_uid)
                gids.append(st.st_gid)
                mts.append(st.st_mtime_ns)
                ats.append(st.st_atime_ns)
            pdf = pdf.assign(mode=modes, uid=uids, gid=gids,
                             mtime_ns=mts, atime_ns=ats)
            yield pdf

    return listing.mapInPandas(add_stats, schema)


def _apply_preserve(dst: str, row, flags: str) -> None:
    """Apply the requested attribute set to one copied file — the
    CopyCommitter/DistCpUtils.preserve order: OWNER before PERMISSION
    (chown on Linux clears setuid/setgid from executables, so a
    chmod-first order would silently strip preserved 04xxx/02xxx
    bits), times LAST (a chmod or chown bumps ctime but must not
    clobber the preserved mtime/atime). Failures raise: the reference
    fails the task when a requested preservation cannot be honored, it
    never silently downgrades."""
    if "u" in flags or "g" in flags:
        os.chown(dst,
                 row.uid if "u" in flags else -1,
                 row.gid if "g" in flags else -1)
    if "p" in flags:
        os.chmod(dst, row.mode)
    if "t" in flags:
        os.utime(dst, ns=(row.atime_ns, row.mtime_ns))


_COPY_BLOCK = 256 * 1024


def _throttled_copy(src: str, dst: str,
                    bandwidth_bps: int | None = None) -> int:
    """Block-wise file copy capped at ``bandwidth_bps`` bytes/sec —
    DistCp's ThrottledInputStream semantics (reference
    hadoop-tools/hadoop-distcp/.../util/ThrottledInputStream.java:36:
    sleep before the next read whenever observed rate exceeds the cap).
    Returns bytes copied."""
    import time
    total, t0 = 0, time.monotonic()
    with open(src, "rb") as fi, open(dst, "wb") as fo:
        while True:
            if bandwidth_bps:
                # sleep until the cumulative rate is back under the cap
                expected = total / bandwidth_bps
                elapsed = time.monotonic() - t0
                if elapsed < expected:
                    time.sleep(expected - elapsed)
            block = fi.read(_COPY_BLOCK)
            if not block:
                return total
            fo.write(block)
            total += len(block)


def distcp_run(plan: DataFrame, bandwidth_bps: int | None = None,
               preserve: str = "") -> int:
    """Execute the copy plan: repartition by chunk, copy per partition,
    optionally throttled to ``bandwidth_bps`` bytes/sec PER TASK (the
    DistCp -bandwidth knob). With ``preserve`` (-p flag letters, see
    PRESERVE_FLAGS) the plan must carry the stat_listing attribute
    columns; each copied file gets the requested source attributes
    applied (times last, so chmod/chown can't clobber them). Returns
    files copied. (Local-FS copy here; on a cluster the same
    foreachPartition body uses the hadoop FS client.)"""
    _check_preserve(preserve)
    if preserve:
        missing = {"mode", "uid", "gid", "mtime_ns",
                   "atime_ns"} - set(plan.columns)
        if missing:
            raise ValueError(f"-p{preserve} needs a stat_listing plan; "
                             f"missing columns {sorted(missing)}")
    n = plan.count()

    def copy_partition(rows) -> None:
        for r in rows:
            src = r.src.removeprefix("file:")
            dst = r.dst.removeprefix("file:")
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            _throttled_copy(src, dst, bandwidth_bps)
            if preserve:
                _apply_preserve(dst, r, preserve)

    plan.repartition("chunk").foreachPartition(copy_partition)
    return n


def distcp_atomic_plan(plan: DataFrame, dst_root: str,
                       work_root: str | None = None) -> DataFrame:
    """Rewrite a copy plan for the -atomic commit protocol (reference
    hadoop-tools/hadoop-distcp/.../mapred/CopyCommitter.java:67 +
    DistCpOptions -atomic/-tmp): every dst is re-rooted under a
    staging ``work_root`` (default ``<dst_root>.distcp.tmp`` — same
    filesystem/parent, so the final rename is a metadata-only atomic
    op), and the intended final path rides along as ``final_dst``.
    Pure column rewrite — no extra shuffle over the input plan. Both
    the dst column and dst_root are normalized of a ``file:`` URI
    scheme (matching distcp_plan's src handling) so a binaryFile-style
    ``file:/...`` dst never mis-slices the staged path."""
    dst_root = dst_root.rstrip("/").removeprefix("file:")
    work_root = (work_root or dst_root + ".distcp.tmp").rstrip("/")
    bare = F.regexp_replace("dst", "^file:", "")
    rel = F.substring(bare, len(dst_root) + 1, 2_147_483_647)
    return (plan.withColumn("final_dst", F.col("dst"))
                .withColumn("dst", F.concat(F.lit(work_root), rel)))


def distcp_run_atomic(plan: DataFrame, dst_root: str,
                      work_root: str | None = None,
                      bandwidth_bps: int | None = None,
                      preserve: str = "") -> int:
    """-atomic copy: stage every file under the work root, then promote
    the WHOLE tree with ONE rename on success; delete the staging tree
    on any failure — dst either appears complete or never appears
    (CopyCommitter.java:67 commitJob -> promotePath, abortJob ->
    delete workDir). The final dst must not pre-exist (the reference
    refuses -atomic onto an existing target: atomicity of rename only
    holds for a fresh path). ``preserve`` composes with staging:
    attributes are applied to the STAGED files and ride through the
    promote rename untouched (rename moves the inode, never its
    metadata). Returns files copied."""
    dst_root = dst_root.rstrip("/").removeprefix("file:")
    work_root = (work_root or dst_root + ".distcp.tmp").rstrip("/")
    if os.path.exists(dst_root):
        raise ValueError(f"-atomic target {dst_root!r} already exists "
                         "(atomic promote requires a fresh path)")
    staged = distcp_atomic_plan(plan, dst_root, work_root)
    shutil.rmtree(work_root, ignore_errors=True)
    try:
        n = distcp_run(staged.drop("final_dst"), bandwidth_bps,
                       preserve=preserve)
        os.makedirs(work_root, exist_ok=True)   # empty plan still commits
        os.rename(work_root, dst_root)          # the atomic promote
        return n
    except BaseException:
        shutil.rmtree(work_root, ignore_errors=True)  # all-or-nothing
        raise


def distcp_run_dynamic(plan: DataFrame, claim_dir: str,
                       n_workers: int = 8,
                       bandwidth_bps: int | None = None,
                       on_chunk_start=None) -> int:
    """Work-stealing copy — DistCp DynamicInputFormat parity (reference
    hadoop-tools/hadoop-distcp/.../mapred/lib/DynamicInputFormat.java:51:
    the listing splits into MORE chunks than tasks; each task claims
    the next unclaimed chunk at runtime, so a straggling task strands
    one chunk, not 1/n of the copy).

    Claims are atomic file creates (O_EXCL) in ``claim_dir`` — the
    same rename/create-once primitive the reference uses on HDFS. The
    chunked plan is materialized to ``claim_dir``/plan as parquet
    partitioned by chunk; workers read only the chunks they claim.
    ``on_chunk_start(worker_id, chunk)`` is a test hook for straggler
    injection. Returns files copied."""
    import glob as globmod

    plan_dir = os.path.join(claim_dir, "plan")
    os.makedirs(claim_dir, exist_ok=True)
    plan.write.mode("overwrite").partitionBy("chunk").parquet(plan_dir)
    chunks = sorted(
        int(os.path.basename(p).split("=", 1)[1])
        for p in globmod.glob(os.path.join(plan_dir, "chunk=*")))
    spark = plan.sparkSession
    n = plan.count()

    def worker(rows) -> None:
        import pyarrow.parquet as pq
        for wid_row in rows:
            wid = wid_row["id"]
            for chunk in chunks:
                claim = os.path.join(claim_dir, f"chunk-{chunk}.claim")
                try:
                    fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                except FileExistsError:
                    continue                      # someone else owns it
                with os.fdopen(fd, "w") as f:
                    f.write(str(wid))
                if on_chunk_start is not None:
                    on_chunk_start(wid, chunk)
                tbl = pq.read_table(os.path.join(plan_dir, f"chunk={chunk}"))
                for src, dst in zip(tbl.column("src").to_pylist(),
                                    tbl.column("dst").to_pylist()):
                    src = src.removeprefix("file:")
                    dst = dst.removeprefix("file:")
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    _throttled_copy(src, dst, bandwidth_bps)
                with open(os.path.join(claim_dir, f"chunk-{chunk}.done"),
                          "w") as f:
                    f.write(str(wid))

    spark.range(n_workers).repartition(n_workers).foreachPartition(worker)
    done = len(globmod.glob(os.path.join(claim_dir, "chunk-*.done")))
    if done != len(chunks):
        raise RuntimeError(f"{len(chunks) - done} chunks not copied")
    return n


def attr_repair_plan(src_stats: DataFrame, dst_stats: DataFrame,
                     src_root: str, dst_root: str,
                     flags: str = "pugt") -> DataFrame:
    """DistCp -update -p metadata repair: join the source and target
    stat listings (stat_listing output) on relative path and emit one
    row per file present on BOTH sides whose requested attributes
    drifted — the reference applies preservation to up-to-date skipped
    files too (DistCpUtils.preserve runs regardless of whether the
    payload was copied). Missing/stale files are the ordinary -update
    copy plan's business, not this one's. One co-partitioned path
    equi-join; output carries the SOURCE attribute values to re-apply
    plus per-attribute drift booleans."""
    _check_preserve(flags)
    sroot = src_root.rstrip("/").removeprefix("file:")
    droot = dst_root.rstrip("/").removeprefix("file:")

    def rel(col: str, root: str):
        return F.substring(F.regexp_replace(col, "^file:", ""),
                           len(root) + 1, 2_147_483_647)

    s = src_stats.select(
        rel("src", sroot).alias("rel"), F.col("src"),
        F.col("mode"), F.col("uid"), F.col("gid"),
        F.col("mtime_ns"), F.col("atime_ns"))
    d = dst_stats.select(
        rel("src", droot).alias("rel"), F.col("src").alias("dst"),
        F.col("mode").alias("dst_mode"), F.col("uid").alias("dst_uid"),
        F.col("gid").alias("dst_gid"),
        F.col("mtime_ns").alias("dst_mtime_ns"))
    j = s.join(d, "rel")
    fix_mode = F.lit("p" in flags) & (F.col("mode") != F.col("dst_mode"))
    fix_owner = ((F.lit("u" in flags) & (F.col("uid") != F.col("dst_uid")))
                 | (F.lit("g" in flags) & (F.col("gid") != F.col("dst_gid"))))
    fix_times = F.lit("t" in flags) & (F.col("mtime_ns")
                                       != F.col("dst_mtime_ns"))
    return (j.withColumn("fix_mode", fix_mode)
             .withColumn("fix_owner", fix_owner)
             .withColumn("fix_times", fix_times)
             .filter(F.col("fix_mode") | F.col("fix_owner")
                     | F.col("fix_times")))


def attr_repair_run(plan: DataFrame, flags: str = "pugt") -> int:
    """Execute an attr_repair_plan: metadata-only pass (chmod/chown/
    utime per drift flag), the DistCh execution shape. Returns files
    repaired."""
    _check_preserve(flags)
    n = plan.count()

    def fix_partition(rows) -> None:
        for r in rows:
            dst = r.dst.removeprefix("file:")
            # owner BEFORE mode (chown clears setuid/setgid bits —
            # same ordering contract as _apply_preserve), times last
            if r.fix_owner:
                os.chown(dst, r.uid if "u" in flags else -1,
                         r.gid if "g" in flags else -1)
            # re-assert mode after ANY chown, not only on mode drift:
            # the chown itself may have just stripped setuid/setgid
            if r.fix_mode or (r.fix_owner and "p" in flags):
                os.chmod(dst, r.mode)
            if r.fix_times:
                os.utime(dst, ns=(r.atime_ns, r.mtime_ns))

    plan.foreachPartition(fix_partition)
    return n


def distch_plan(listing: DataFrame, owner: str | None = None,
                mode: str | None = None) -> DataFrame:
    """DistCh parity: metadata-change plan (owner/mode columns); executed
    by a foreachPartition like distcp_run."""
    out = listing
    if owner:
        out = out.withColumn("new_owner", F.lit(owner))
    if mode:
        out = out.withColumn("new_mode", F.lit(mode))
    return out


# --- erasure coding kernels --------------------------------------------------

_GF_EXP = None
_GF_LOG = None


def _gf_tables():
    """GF(2^8) log/antilog tables, generator polynomial 0x11d (standard
    Reed-Solomon construction, public algorithm)."""
    global _GF_EXP, _GF_LOG
    if _GF_EXP is None:
        exp = [0] * 512
        log = [0] * 256
        x = 1
        for i in range(255):
            exp[i] = x
            log[x] = i
            x <<= 1
            if x & 0x100:
                x ^= 0x11d
        for i in range(255, 512):
            exp[i] = exp[i - 255]
        _GF_EXP, _GF_LOG = exp, log
    return _GF_EXP, _GF_LOG


def _gf_mul_bytes(a, coef: int):
    """Vectorized GF(2^8) scalar-multiply of a numpy byte array."""
    import numpy as np
    if coef == 0:
        return np.zeros_like(a)
    exp, log = _gf_tables()
    exp_arr = np.array(exp, dtype=np.uint8)
    log_arr = np.array(log, dtype=np.int32)
    out = exp_arr[(log_arr[a] + log[coef]) % 255]
    out[a == 0] = 0
    return out


def _group_starts(g):
    """Start offsets of each run in a sorted group array."""
    import numpy as np
    return np.nonzero(np.r_[True, g[1:] != g[:-1]])[0]


def xor_parity(blocks: DataFrame, group_col: str = "stripe",
               data_col: str = "data", batched: bool = False) -> DataFrame:
    """XOR code (XORCode parity): parity block = XOR of the stripe's
    data blocks. Two kernel shapes for two stripe regimes:

    - default (applyInPandas per group): one Arrow round-trip PER
      STRIPE — right when stripes are few and blocks are big (the
      production erasure shape, 64-256 MB blocks).
    - ``batched`` (repartition on the stripe key + mapInPandas, whole
      partition folded with one np.bitwise_xor.reduceat): right when
      stripes are MANY and tiny — per-group pandas overhead dominated
      the audit queries at sf1 (14 s for 12.5k four-block stripes);
      the batched fold is one round-trip per partition. Byte-equal to
      the grouped kernel (pytest)."""
    import numpy as np
    import pandas as pd

    if batched:
        def fold_batches(pdf_iter):
            pdfs = [p for p in pdf_iter if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            g = pdf[group_col].to_numpy()
            order = np.argsort(g, kind="stable")
            g = g[order]
            mat = np.stack([np.frombuffer(bytes(b), dtype=np.uint8)
                            for b in pdf[data_col].to_numpy()[order]])
            starts = _group_starts(g)
            par = np.bitwise_xor.reduceat(mat, starts, axis=0)
            yield pd.DataFrame({group_col: g[starts],
                                "parity": [r.tobytes() for r in par]})

        return (blocks.select(group_col, data_col)
                      .repartition(group_col)
                      .mapInPandas(fold_batches,
                                   schema=f"{group_col} long, parity binary"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf[data_col]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_xor(acc, arr)
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]],
                             "parity": [acc.tobytes()]})

    return (blocks.repartition(group_col)
                  .groupBy(group_col)
                  .applyInPandas(fold, schema=f"{group_col} long, parity binary"))


def rs_encode(blocks: DataFrame, n_parity: int = 2, group_col: str = "stripe",
              idx_col: str = "block_idx", data_col: str = "data",
              batched: bool = False) -> DataFrame:
    """Reed-Solomon encode per stripe: parity_j = Σ_i gf_mul(data_i,
    g^(i·j)) (Vandermonde rows over GF(2^8)). Output: (stripe,
    parity_idx, parity). Matches ReedSolomonCode.encode's role
    (MapReduceEncoder pipeline) without porting its code. ``batched``
    is the many-tiny-stripes shape (see xor_parity): whole partition
    per Arrow round-trip, the GF multiply fully vectorized over the
    byte matrix via the log/exp tables, XOR folds with reduceat —
    byte-equal to the grouped kernel (pytest)."""
    import numpy as np
    import pandas as pd
    exp, log = _gf_tables()

    if batched:
        exp_np = np.asarray(exp, dtype=np.int64)
        log_np = np.asarray(log, dtype=np.int64)

        def encode_batches(pdf_iter):
            pdfs = [p for p in pdf_iter if len(p)]
            if not pdfs:
                return
            pdf = pd.concat(pdfs, ignore_index=True)
            g = pdf[group_col].to_numpy()
            ix = pdf[idx_col].to_numpy()
            order = np.lexsort((ix, g))
            g, _ = g[order], ix[order]
            mat = np.stack([np.frombuffer(bytes(b), dtype=np.uint8)
                            for b in pdf[data_col].to_numpy()[order]])
            starts = _group_starts(g)
            counts = np.diff(np.r_[starts, len(g)])
            i = np.arange(len(g)) - np.repeat(starts, counts)
            logs = log_np[mat]                       # (rows, blocklen)
            out = []
            for j in range(n_parity):
                lc = (i * (j + 1)) % 255             # log of coefficient
                m = exp_np[(logs + lc[:, None]) % 255]
                m[mat == 0] = 0
                par = np.bitwise_xor.reduceat(m, starts, axis=0)
                out.append(pd.DataFrame(
                    {group_col: g[starts], "parity_idx": j,
                     "parity": [r.astype(np.uint8).tobytes()
                                for r in par]}))
            yield pd.concat(out, ignore_index=True)

        return (blocks.select(group_col, idx_col, data_col)
                      .repartition(group_col)
                      .mapInPandas(
                          encode_batches,
                          schema=f"{group_col} long, parity_idx int, "
                                 "parity binary"))

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx_col)
        datas = [np.frombuffer(bytes(b), dtype=np.uint8) for b in pdf[data_col]]
        out = []
        for j in range(n_parity):
            acc = np.zeros_like(datas[0])
            for i, d in enumerate(datas):
                coef = exp[(i * (j + 1)) % 255]
                acc = np.bitwise_xor(acc, _gf_mul_bytes(d, coef))
            out.append((int(pdf[group_col].iloc[0]), j, acc.tobytes()))
        return pd.DataFrame(out, columns=[group_col, "parity_idx", "parity"])

    return (blocks.repartition(group_col)
                  .groupBy(group_col)
                  .applyInPandas(encode,
                                 schema=f"{group_col} long, parity_idx int, parity binary"))


def rs_reconstruct(blocks: DataFrame, parities: DataFrame, lost_idx: int,
                   group_col: str = "stripe", idx_col: str = "block_idx",
                   data_col: str = "data") -> DataFrame:
    """Reconstruct ONE lost data block per stripe from the surviving
    blocks + the first parity (BlockReconstructor role,
    hops-erasure-coding-project/.../BlockReconstructor.java — same math,
    not a port): parity_0 = Σ_i data_i·g^i in GF(2^8), so
    data_k = (parity_0 ⊕ Σ_{i≠k} data_i·g^i) · g^{-k}, with
    g^{-k} = g^{255-k} (g^255 = 1). Two simultaneous losses would use
    both parity rows (2×2 GF solve) — the repair *driver* (which blocks
    are lost, per stripe) comes from the meta_under_replicated scan.

    Output: (stripe, block_idx=lost_idx, data)."""
    import numpy as np
    import pandas as pd
    exp, _ = _gf_tables()

    surv = blocks.filter(F.col(idx_col) != lost_idx) \
                 .select(group_col, idx_col, data_col)
    p0 = (parities.filter(F.col("parity_idx") == 0)
                  .select(group_col, F.lit(-1).alias(idx_col),
                          F.col("parity").alias(data_col)))
    both = surv.unionByName(p0)
    inv_coef = exp[(255 - (lost_idx % 255)) % 255]

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for _, row in pdf.iterrows():
            arr = np.frombuffer(bytes(row[data_col]), dtype=np.uint8)
            term = arr if row[idx_col] == -1 else \
                _gf_mul_bytes(arr, exp[(int(row[idx_col]) * 1) % 255])
            acc = term.copy() if acc is None else np.bitwise_xor(acc, term)
        data_k = _gf_mul_bytes(acc, inv_coef)
        return pd.DataFrame({group_col: [int(pdf[group_col].iloc[0])],
                             idx_col: [lost_idx],
                             data_col: [data_k.tobytes()]})

    return (both.repartition(group_col)
                .groupBy(group_col)
                .applyInPandas(rebuild,
                               schema=f"{group_col} long, {idx_col} int, {data_col} binary"))


def rs_reconstruct2(blocks: DataFrame, parities: DataFrame,
                    lost_a: int, lost_b: int,
                    group_col: str = "stripe", idx_col: str = "block_idx",
                    data_col: str = "data") -> DataFrame:
    """Reconstruct TWO lost data blocks per stripe — the 2×2 GF(2^8)
    solve over both parity rows (the reference's RS code recovers up to
    n_parity erasures; ReedSolomonCode.decode's role, same math, not a
    port). With the encode convention parity_j = Σ_i d_i·g^(i·(j+1)):

        S0 = p0 ⊕ Σ_{i∉{a,b}} d_i·g^i      = d_a·g^a  ⊕ d_b·g^b
        S1 = p1 ⊕ Σ_{i∉{a,b}} d_i·g^(2i)   = d_a·g^2a ⊕ d_b·g^2b
        d_b = (S1 ⊕ S0·g^a) / (g^(a+b) ⊕ g^2b)     [nonzero iff a≠b]
        d_a = (S0 ⊕ d_b·g^b)·g^(-a)

    Output: (stripe, block_idx, data) — two rows per stripe."""
    import numpy as np
    import pandas as pd
    if lost_a == lost_b:
        raise ValueError("two distinct lost indices required")
    exp, log = _gf_tables()

    surv = blocks.filter(~F.col(idx_col).isin([lost_a, lost_b])) \
                 .select(group_col, idx_col, data_col)
    ps = (parities.filter(F.col("parity_idx").isin([0, 1]))
                  .select(group_col,
                          (-1 - F.col("parity_idx")).alias(idx_col),
                          F.col("parity").alias(data_col)))
    both = surv.unionByName(ps)
    ga, gb = exp[lost_a % 255], exp[lost_b % 255]
    denom = exp[(lost_a + lost_b) % 255] ^ exp[(2 * lost_b) % 255]
    inv_denom = exp[(255 - log[denom]) % 255]
    inv_ga = exp[(255 - (lost_a % 255)) % 255]

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        s0 = s1 = None
        for _, row in pdf.iterrows():
            arr = np.frombuffer(bytes(row[data_col]), dtype=np.uint8)
            i = int(row[idx_col])
            if i == -1:                      # parity_0
                t0, t1 = arr, None
            elif i == -2:                    # parity_1
                t0, t1 = None, arr
            else:
                t0 = _gf_mul_bytes(arr, exp[i % 255])
                t1 = _gf_mul_bytes(arr, exp[(2 * i) % 255])
            if t0 is not None:
                s0 = t0.copy() if s0 is None else np.bitwise_xor(s0, t0)
            if t1 is not None:
                s1 = t1.copy() if s1 is None else np.bitwise_xor(s1, t1)
        d_b = _gf_mul_bytes(
            np.bitwise_xor(s1, _gf_mul_bytes(s0, ga)), inv_denom)
        d_a = _gf_mul_bytes(
            np.bitwise_xor(s0, _gf_mul_bytes(d_b, gb)), inv_ga)
        g = int(pdf[group_col].iloc[0])
        return pd.DataFrame(
            [(g, lost_a, d_a.tobytes()), (g, lost_b, d_b.tobytes())],
            columns=[group_col, idx_col, data_col])

    return (both.repartition(group_col)
                .groupBy(group_col)
                .applyInPandas(rebuild,
                               schema=f"{group_col} long, {idx_col} int, {data_col} binary"))


def src_encode(blocks: DataFrame, group_size: int = 5,
               n_global_parity: int = 2, group_col: str = "stripe",
               idx_col: str = "block_idx", data_col: str = "data",
               batched: bool = False) -> tuple[DataFrame, DataFrame]:
    """SimpleRegeneratingCode-shaped LOCALLY REPAIRABLE code
    (hops-erasure-coding-project/.../SimpleRegeneratingCode.java — same
    contract, not a port): the stripe's data blocks split into local
    groups of ``group_size``, each group gets a LOCAL XOR parity, and
    RS global parities cover the whole stripe. The point is repair
    bandwidth: a single lost block is rebuilt from its ``group_size``
    local peers instead of the whole stripe (k/group_size less read
    I/O — the regenerating-code property); multi-loss falls back to
    the RS globals (``rs_reconstruct``/``rs_reconstruct2``).

    Returns (local_parities: (stripe, local_group, parity),
             global_parities: rs_encode output)."""
    grouped = blocks.withColumn(
        "_lg", (F.col(idx_col) / group_size).cast("long"))
    local = (xor_parity(
        grouped.withColumn(
            group_col,
            F.col(group_col) * 1_000_000 + F.col("_lg")),
        group_col, data_col, batched=batched)
        .select((F.col(group_col) / 1_000_000).cast("long").alias(group_col),
                F.pmod(F.col(group_col), F.lit(1_000_000)).cast("long")
                 .alias("local_group"),
                "parity"))
    return local, rs_encode(blocks, n_global_parity, group_col,
                            idx_col, data_col, batched=batched)


def src_repair_local(blocks: DataFrame, local_parities: DataFrame,
                     lost_idx: int, group_size: int = 5,
                     group_col: str = "stripe", idx_col: str = "block_idx",
                     data_col: str = "data",
                     batched: bool = False) -> DataFrame:
    """Single-loss LOCAL repair: lost block = XOR of its local group's
    survivors and the group's parity. The input is FILTERED to the lost
    block's group before any compute — the scan touches group_size
    rows per stripe, never the stripe (the locality contract;
    tests prove repair succeeds with every other group absent)."""
    import numpy as np
    import pandas as pd

    lg = lost_idx // group_size
    peers = (blocks
             .filter((F.col(idx_col) / group_size).cast("long") == lg)
             .filter(F.col(idx_col) != lost_idx)
             .select(group_col, F.col(data_col).alias("_d")))
    par = (local_parities.filter(F.col("local_group") == lg)
                         .select(group_col, F.col("parity").alias("_d")))
    both = peers.unionByName(par)
    if batched:
        # the rebuild IS an XOR fold over (survivors + parity) —
        # delegate to the batched kernel (byte-equal, see xor_parity)
        return (xor_parity(both, group_col, "_d", batched=True)
                .select(group_col, F.lit(lost_idx).cast("int")
                         .alias(idx_col),
                        F.col("parity").alias(data_col)))

    def rebuild(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf["_d"]:
            arr = np.frombuffer(bytes(b), dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_xor(acc, arr)
        return pd.DataFrame({group_col: [int(pdf[group_col].iloc[0])],
                             idx_col: [lost_idx],
                             data_col: [acc.tobytes()]})

    return (both.repartition(group_col)
                .groupBy(group_col)
                .applyInPandas(
                    rebuild,
                    schema=f"{group_col} long, {idx_col} int, {data_col} binary"))
