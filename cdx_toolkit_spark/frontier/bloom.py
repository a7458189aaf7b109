"""Partitioned counting-bloom URL-seen store.

Design for 10^10 URLs (north_star):
- keys are xxhash64(urlkey) longs (computed JVM-side at ingest);
- the key space is split into `n_shards` buckets by pmod(url_hash); each
  shard owns an independent counting-bloom (uint8 saturating counters), so
  shard size — not corpus size — bounds executor memory;
- build/probe/add/remove run as *cogrouped* applyInPandas per shard: the
  counter blob meets its key batch exactly once per shard (never replicated
  per key row), and each group does one vectorized numpy pass;
- shards are versioned: every mutation writes version v+1 and leaves v
  intact — this is the bloom-shard-version lineage that checkpoint resume
  records (north_rule);
- counting counters support deletes (remove()); a cuckoo filter is the
  documented fallback where exact delete accounting under saturation
  matters — saturated counters (pinned at 255) are never decremented.

Guarantee: ZERO false negatives (property-tested in tests/test_frontier.py).
False positives are bounded by (m, k, n) and measured; the *exact*
anti-join backstop (scheduler.dedupe_candidates) only touches
bloom-positive rows — at scale the expensive exact join runs on
~fp_rate × |candidates| rows instead of all of them.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SHARD_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("version", LongType()),
        StructField("m_bits", LongType()),
        StructField("k", IntegerType()),
        StructField("n_items", LongType()),
        StructField("counters", BinaryType()),
    ]
)

PROBE_SCHEMA = StructType(
    [
        StructField("url_hash", LongType()),
        StructField("maybe_seen", IntegerType()),
    ]
)


def _positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k probe positions per key via double hashing — fully vectorized.
    h1 = key, h2 = mix(key)|1 (odd => cycles the whole table);
    pos_i = (h1 + i*h2) mod m."""
    h = hashes.astype(np.uint64)
    h2 = h ^ np.uint64(0x9E3779B97F4A7C15)
    h2 = (h2 ^ (h2 >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h2 = (h2 ^ (h2 >> np.uint64(33))) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h[:, None] + i * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


# per-WORKER counter cache for the small-store direct probe: keyed by
# (store path, version); one version resident at a time. Lives at module
# level in a shipped module, so a reused Python worker
# (spark.python.worker.reuse=true, the default) keeps it across tasks and
# micro-batches — the load runs once per worker per version (guide §4.5).
_PROBE_CACHE: dict = {}


def _load_counters(path: str, version: int) -> dict:
    key = (path, version)
    cts = _PROBE_CACHE.get(key)
    if cts is None:
        import pyarrow.dataset as ds

        tbl = ds.dataset(path, format="parquet").to_table(
            columns=["shard", "counters"],
            filter=ds.field("version") == version,
        )
        cts = {
            int(s): np.frombuffer(b, dtype=np.uint8)
            for s, b in zip(
                tbl.column("shard").to_pylist(),
                tbl.column("counters").to_pylist(),
            )
        }
        _PROBE_CACHE.clear()  # keep ONE version resident per worker
        _PROBE_CACHE[key] = cts
    return cts


def shard_of(url_hash, n_shards: int):
    c = F.col(url_hash) if isinstance(url_hash, str) else url_hash
    return F.pmod(c, F.lit(n_shards)).cast("int")


class BloomShardStore:
    """Counting-bloom shards persisted as versioned parquet under `path`."""

    def __init__(self, spark: SparkSession, path: str, n_shards: int = 16,
                 m_bits: int = 1 << 20, k: int = 5,
                 probe_broadcast_bytes: int = 0):
        from ..shipping import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.path = path
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k = k
        # OPT-IN direct-probe strategy (r7, measured): when > 0 and the
        # WHOLE counter store fits under this budget, probe() flags keys
        # in a single projected pandas_udf whose workers load the counters
        # from the store files (cached per worker per VERSION) — zero
        # shuffles, no flag join-back. A/B on a 128 MiB store, 500k keys,
        # 32 workers: repeated probes of one version 0.5 s vs cogroup
        # 1.4-1.8 s; but a FRESH version per probe (the drain's per-epoch
        # pattern) costs 3.5-5.7 s — every worker reloads the store — so
        # the default is 0 (always cogroup). Enable for read-mostly
        # workloads that probe one version many times (a dedup service,
        # a backfill), sized to worker memory (one store copy per worker).
        self.probe_broadcast_bytes = probe_broadcast_bytes
        # in-process version cache: latest_version() is otherwise a small
        # Spark job (parquet read + max agg) and the drain asks 3-4 times
        # PER EPOCH — pure fixed overhead that caps scaling efficiency.
        # Mutations go through this object, so the cache stays coherent
        # in-process; a fresh process (crash replay) starts cold and reads
        # disk, which is exactly the resume semantics the manifest needs.
        self._version_cache: int | None = None

    # -- versioning -------------------------------------------------------

    def latest_version(self, refresh: bool = False) -> int:
        if self._version_cache is not None and not refresh:
            return self._version_cache
        try:
            # explicit schema: a schemaless parquet read runs a footer
            # inference pass first — pure per-call overhead (r7, guide §6)
            df = self.spark.read.schema(SHARD_SCHEMA).parquet(self.path)
        except Exception:
            # cache the 0 only when the store is CONFIRMED absent/empty; a
            # transient read failure must not pin 0 for the process
            # lifetime — a later add() would take base_version=0 and write
            # a duplicate version-1 row set over existing higher versions
            # (ADVICE r2)
            if not any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(self.path)
                for f in fs
            ):
                self._version_cache = 0
            return 0
        row = df.agg(F.max("version")).first()
        self._version_cache = int(row[0]) if row[0] is not None else 0
        return self._version_cache

    def _read_version(self, version: int) -> DataFrame:
        return (
            self.spark.read.schema(SHARD_SCHEMA)
            .parquet(self.path)
            .where(F.col("version") == version)
        )

    # -- mutation ----------------------------------------------------------

    def build(self, keys: DataFrame, hash_col: str = "url_hash") -> int:
        """Create version 1 from scratch over a key DataFrame."""
        return self._apply_delta(keys, hash_col, base_version=0, sign=+1)

    def add(self, keys: DataFrame, hash_col: str = "url_hash") -> int:
        return self._apply_delta(
            keys, hash_col, base_version=self.latest_version(), sign=+1
        )

    def remove(self, keys: DataFrame, hash_col: str = "url_hash") -> int:
        return self._apply_delta(
            keys, hash_col, base_version=self.latest_version(), sign=-1
        )

    def _apply_delta(self, keys: DataFrame, hash_col: str,
                     base_version: int, sign: int) -> int:
        m_bits, k, n_shards = self.m_bits, self.k, self.n_shards
        new_version = base_version + 1
        prev = (
            self._read_version(base_version).select(
                "shard", "n_items", "counters"
            )
            if base_version > 0
            else self.spark.createDataFrame(
                [], "shard int, n_items long, counters binary"
            )
        )
        delta = keys.select(
            F.col(hash_col).alias("url_hash"),
            shard_of(F.col(hash_col), n_shards).alias("shard"),
        )

        def update(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            counters = (
                np.frombuffer(bytes(right["counters"].iloc[0]), dtype=np.uint8).copy()
                if len(right)
                else np.zeros(m_bits, dtype=np.uint8)
            )
            prev_n = int(right["n_items"].iloc[0]) if len(right) else 0
            if len(left):
                hashes = left["url_hash"].to_numpy(dtype=np.int64)
                pos = _positions(hashes, m_bits, k).ravel()
                delta_counts = np.bincount(pos, minlength=m_bits)
                wide = counters.astype(np.int64)
                saturated = counters == 255
                if sign > 0:
                    wide += delta_counts
                    prev_n += len(hashes)
                else:
                    wide -= delta_counts
                    prev_n = max(0, prev_n - len(hashes))
                wide[saturated] = 255  # saturated counters stay pinned
                counters = np.clip(wide, 0, 255).astype(np.uint8)
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "version": [new_version],
                    "m_bits": [m_bits],
                    "k": [k],
                    "n_items": [prev_n],
                    "counters": [counters.tobytes()],
                }
            )

        updated = (
            delta.groupBy("shard")
            .cogroup(prev.groupBy("shard"))
            .applyInPandas(update, SHARD_SCHEMA)
        )
        updated.write.mode("append").parquet(self.path)
        self._version_cache = new_version
        return new_version

    # -- probe -------------------------------------------------------------

    def probe(self, keys: DataFrame, hash_col: str = "url_hash",
              version: int | None = None) -> DataFrame:
        """keys + maybe_seen flag. No false negatives; positives need the
        exact backstop.

        Two plans (r7):
        - default: cogrouped per-shard pass — the counter blob meets the
          key batch once per shard (never replicated per key row) and
          per-worker memory is bounded by one shard, not the store. r7
          dropped the key-set `.distinct()` (a full shuffle; `np.unique`
          in the kernel keeps the one-flag-row-per-hash invariant).
        - opt-in (`probe_broadcast_bytes` > 0, store fits): a single
          projected pandas_udf whose WORKERS load the counter blobs from
          the store files, cached module-level per (path, version) so a
          reused worker pays the load once per version, not per task
          (guide §4.5; an sc.broadcast was measured 10 s/epoch slower —
          every Python worker unpickles the full store). Zero exchanges,
          but every worker reloads the store once per VERSION — a win
          only for read-mostly repeated probes (see __init__ A/B note).
        Flag semantics are identical (same _positions, same counters)."""
        version = version if version is not None else self.latest_version()
        m_bits, k, n_shards = self.m_bits, self.k, self.n_shards
        if version == 0:
            return keys.withColumn("maybe_seen", F.lit(False))
        if self.n_shards * self.m_bits <= self.probe_broadcast_bytes:
            path = self.path

            @F.pandas_udf("boolean")
            def _maybe_seen(h: pd.Series) -> pd.Series:
                hashes = h.to_numpy(dtype=np.int64)
                if not len(hashes):
                    return pd.Series([], dtype=bool)
                cts = _load_counters(path, version)
                # numpy mod follows the divisor's sign => pmod semantics
                shard = np.mod(hashes, n_shards)
                pos = _positions(hashes, m_bits, k)
                seen = np.zeros(len(hashes), dtype=bool)
                for s in np.unique(shard):
                    sel = shard == s
                    c = cts.get(int(s))
                    if c is None:
                        continue
                    seen[sel] = (c[pos[sel]] > 0).all(axis=1)
                return pd.Series(seen)

            return keys.withColumn("maybe_seen", _maybe_seen(F.col(hash_col)))
        shards = self._read_version(version).select("shard", "counters")
        # no .distinct(): callers probe already-deduped keys, and the
        # check kernel np.unique's its batch so the flag frame still holds
        # one row per hash (the join-back multiplicity guard) — dropping
        # the distinct removes a full shuffle of the key set (r7)
        cand = keys.select(
            F.col(hash_col).alias("url_hash"),
            shard_of(F.col(hash_col), n_shards).alias("shard"),
        )

        def check(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            hashes = np.unique(left["url_hash"].to_numpy(dtype=np.int64))
            if not len(hashes):
                return pd.DataFrame({"url_hash": [], "maybe_seen": []}).astype(
                    {"url_hash": "int64", "maybe_seen": "int32"}
                )
            if not len(right):
                return pd.DataFrame(
                    {
                        "url_hash": hashes,
                        "maybe_seen": np.zeros(len(hashes), dtype=np.int32),
                    }
                )
            counters = np.frombuffer(bytes(right["counters"].iloc[0]), dtype=np.uint8)
            pos = _positions(hashes, m_bits, k)
            seen = (counters[pos] > 0).all(axis=1).astype(np.int32)
            return pd.DataFrame({"url_hash": hashes, "maybe_seen": seen})

        flags = (
            cand.groupBy("shard")
            .cogroup(shards.groupBy("shard"))
            .applyInPandas(check, PROBE_SCHEMA)
            .withColumn("maybe_seen", F.col("maybe_seen") == 1)
        )
        # NO broadcast hint: the flag set is EPOCH-sized (one row per
        # distinct candidate hash). AQE picks broadcast when the epoch is
        # small enough and a shuffled join when it is not — a forced
        # broadcast of a 10^8-candidate epoch would collect the whole flag
        # frame to the driver (the r2 code did exactly that)
        joined = keys.join(
            flags.withColumnRenamed("url_hash", "__uh"),
            keys[hash_col] == F.col("__uh"),
            "left",
        )
        return joined.select(
            *[keys[c] for c in keys.columns],
            F.coalesce("maybe_seen", F.lit(False)).alias("maybe_seen"),
        )

    def destroy(self):
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)
        self._version_cache = None
