package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment-table lookup stage (reference: lib/enrichment/src/lib.rs:50-88
  * — `find_table_row` with AND-ed Equals conditions over an indexed small
  * table; exposed to VRL as `get_enrichment_table_record`).
  *
  * Spark-first mapping: a broadcast hash join. The lookup table is small by
  * construction (it is an operator config artifact, not data), so the join
  * never shuffles the fact table — at 100 TB this is the difference between
  * a map-side join and a catastrophic sort-merge.
  */
object Enrich {

  /** Left-join enrichment. Rows with no lookup match keep null attributes
    * (the VRL caller decides; `get_enrichment_table_record` errors on
    * missing rows — see [[strict]]).
    */
  def lookup(df: DataFrame, table: DataFrame, keys: Seq[String]): DataFrame =
    df.join(broadcast(table), keys, "left")

  /** Strict enrichment mirroring `find_table_row`'s exactly-one-row
    * contract (lib/enrichment/src/lib.rs:54-60): rows that miss the table
    * are diverted to the dropped lane with a reason, like remap's
    * `reroute_dropped` (src/transforms/remap.rs:149-153).
    *
    * Returns (enriched, dropped). Both are views over ONE broadcast-join
    * plan — Spark evaluates the join once per consumed branch; callers that
    * consume both should persist upstream or take the `missFlag` column
    * route.
    */
  def strict(df: DataFrame, table: DataFrame, keys: Seq[String],
             probeCol: String): (DataFrame, DataFrame) = {
    val joined = lookup(df, table, keys)
    val ok = joined.filter(col(probeCol).isNotNull)
    val dropped = joined.filter(col(probeCol).isNull)
      .select((df.columns.map(col) :+
        lit("enrich_miss").as("drop_reason") :+
        lit("enrich").as("component_id")): _*)
    (ok, dropped)
  }

  /** CIDR-prefix enrichment — the geoip/mmdb table *shape* without MaxMind
    * data (reference: src/enrichment_tables/geoip.rs, mmdb.rs; scalar base
    * `ip_cidr_contains` in [[graft.functions.Vrl]]). The prefix table holds
    * `cidr` ("a.b.c.d/len") plus attribute columns; matching is
    * longest-prefix-wins.
    *
    * Scale shape: one broadcast hash join per DISTINCT prefix length
    * (enrichment tables are config artifacts — a handful of lengths), each
    * keyed on `ip_aton(ip) >> (32-len)` — pure integer shifts, no range
    * scan, and the fact table never shuffles. Attribute columns coalesce
    * longest-length-first.
    */
  def cidrLookup(df: DataFrame, table: DataFrame, ip: Column,
                 cidrCol: String = "cidr"): DataFrame = {
    import graft.functions.Vrl
    val t = table
      .withColumn("_net", substring_index(col(cidrCol), "/", 1))
      .withColumn("_len", substring_index(col(cidrCol), "/", -1).cast("int"))
    val lens = t.select(col("_len")).distinct()
      .collect().map(_.getInt(0)).sorted.reverse.toSeq // config-sized collect
    val attrCols = table.columns.filterNot(_ == cidrCol).toSeq
    val joined = lens.zipWithIndex.foldLeft(df) { case (d, (len, i)) =>
      val keyed = t.filter(col("_len") === len)
        .select(shiftright(Vrl.ipAton(col("_net")), 32 - len).as(s"_k$i") +:
          attrCols.map(a => col(a).as(s"_${a}_$i")): _*)
      d.join(broadcast(keyed),
        shiftright(Vrl.ipAton(ip), 32 - len) === col(s"_k$i"), "left")
        .drop(s"_k$i")
    }
    attrCols.foldLeft(joined) { (d, a) =>
      d.withColumn(a, coalesce(lens.indices.map(i => col(s"_${a}_$i")): _*))
        .drop(lens.indices.map(i => s"_${a}_$i"): _*)
    }
  }

  /** Date-range enrichment (reference `BetweenDates` condition,
    * lib/enrichment/src/lib.rs:23-41): equality keys plus ts ∈ [from, to).
    * Still a broadcast join — the range predicate rides along as a join
    * condition.
    */
  def lookupBetween(df: DataFrame, table: DataFrame, keys: Seq[String],
                    ts: Column, from: Column, to: Column): DataFrame = {
    val cond = keys.map(k => df(k) === table(k)).reduce(_ && _) && ts >= from && ts < to
    keys.foldLeft(df.join(broadcast(table), cond, "left"))((d, k) => d.drop(table(k)))
  }

  /** As-of enrichment: attach to every fact row the attributes of the
    * LATEST dim row with the same key and `dimTs <= factTs` — the
    * slowly-changing-dimension lookup a log pipeline needs when the
    * enrichment state is itself versioned (the reference reloads its
    * enrichment tables on a timer, lib/enrichment/src/lib.rs:103-118; the
    * batch analog of "which table version was live when this event
    * happened"). DuckDB/kdb call this ASOF JOIN; Flink a temporal table
    * join. Spark has no builtin, and the naive
    * `JOIN ON key AND dimTs <= factTs` + max() explodes to
    * |facts|×|versions| intermediate rows.
    *
    * Spark-first shape: ONE hash shuffle, NO row explosion — union the
    * tagged dim rows into the fact stream and sort each key's timeline
    * once; `last(<dim struct>, ignoreNulls)` over
    * `Window.partitionBy(key).orderBy(ts, tag)` carries the most recent
    * state forward. Dim rows sort BEFORE facts at equal ts (tag 0 < 1),
    * giving the inclusive `factTs >= dimTs` contract. Facts before their
    * key's first dim version keep null attributes (left as-of). The whole
    * dim row travels as one struct, so a newer version's null attribute
    * correctly OVERRIDES an older non-null one. Cost at any scale = the
    * same single exchange+sort a groupBy would pay; a pathologically hot
    * key serializes only its own timeline (salt by coarse time bucket and
    * replicate boundary state if one key dominates an executor).
    *
    * Dims must be unique per (key, ts) — versioned state is by
    * construction.
    */
  def asofJoin(facts: DataFrame, dims: DataFrame, key: String,
               factTs: String, dimTs: String, attrs: Seq[String],
               stateTsOut: String = "state_ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = facts
      .withColumn("_ats", col(factTs).cast("timestamp"))
      .withColumn("_tag", lit(1))
    val r = dims.select(
      col(key) +: col(dimTs).cast("timestamp").as("_ats") +:
        lit(0).as("_tag") +: attrs.map(a => col(a).as(s"_d_$a")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_ats"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dimStruct = last(
      when(col("_tag") === 0,
        struct(col("_ats").as("_sts") +: attrs.map(a => col(s"_d_$a").as(a)): _*)),
      ignoreNulls = true).over(w)
    u.withColumn("_st", dimStruct)
      .filter(col("_tag") === 1)
      .select(facts.columns.toSeq.map(col) ++
        attrs.map(a => col("_st").getField(a).as(a)) :+
        col("_st").getField("_sts").as(stateTsOut): _*)
  }

  /** Skew-defusing salted shuffle join — for dim tables too big to
    * broadcast joined on keys too skewed to shuffle flat (the "one tenant
    * is 40% of the logs" case; the reference meets it as per-sink
    * key-hash partitioning, src/sinks/util/partitioner.rs — here the
    * same defusal applied to the join itself).
    *
    * Facts gain `_salt = xxhash64(rowKey) mod salts` (deterministic — any
    * per-row column works; a unique id gives a uniform spread); dims are
    * replicated once per salt via a `sequence`+`explode` (×salts rows,
    * cheap because dims are the small-but-unbroadcastable side). The join
    * key becomes (key, _salt), so a hot key's fact rows spread over
    * `salts` reducers instead of ONE. Row-level semantics are exactly the
    * plain join's (each fact row meets precisely the dim copies carrying
    * its own salt) for inner/left types.
    *
    * When to reach for it at 100 TB: AQE's skew-join split only rescues
    * sort-merge joins AFTER a skewed shuffle materializes; explicit
    * salting keeps every shuffle block bounded up front and also carries
    * the layout into the downstream stage. salts ≈ ceil(hot-key share ×
    * target parallelism) — 8–32 covers most log skew.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 rowKey: Column, salts: Int = 8,
                 joinType: String = "left"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val fs = facts.withColumn("_salt",
      pmod(xxhash64(rowKey), lit(salts.toLong)).cast("int"))
    val ds = dims.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    fs.join(ds, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Bloom-pruned inner join — semi-join pushdown for selective joins
    * where the dim key set is small enough to SKETCH but the join itself
    * must still shuffle (dims too big or too wide to broadcast whole).
    *
    * The dim keys fold into ONE mergeable Bloom bitset
    * ([[graft.sketch.BloomSketch]] — map-side-combinable OR-merge, shuffle
    * volume = mBits/8 bytes per partition regardless of dim size), the
    * packed sketch ships as a broadcast variable, and facts pay a narrow
    * codegen'd k-bit probe BEFORE the join shuffle. With join selectivity
    * s and false-positive rate p, the fact shuffle shrinks to (s+p) of the
    * table — at 100 TB that is the join. No false negatives, and false
    * positives are dropped by the real join, so the result is exactly the
    * plain inner join (the same contract as Spark's internal
    * bloom_filter_agg runtime filter, here available as an explicit
    * operator with the repo's cross-engine md5 bit scheme).
    *
    * Driver-side cost: one mBits/8-byte sketch materialization (a
    * model-sized artifact, same pattern as `TokenOps.bloomSketchValue`).
    */
  def bloomPrunedJoin(facts: DataFrame, dims: DataFrame, key: String,
                      mBits: Long = 1L << 22, k: Int = 3): DataFrame = {
    import graft.sketch.BloomSketch
    import graft.text.Hashing
    val sketch = dims.agg(BloomSketch.agg(Hashing.h15(col(key)), mBits, k))
      .head().getAs[Array[Byte]](0)
    val bc = facts.sparkSession.sparkContext.broadcast(sketch)
    facts.filter(BloomSketch.probe(bc, Hashing.h15(col(key)), k))
      .join(dims, Seq(key), "inner")
  }

  /** `find_enrichment_table_records` (find_enrichment_table_records.cue;
    * lib/enrichment/src/lib.rs `find_table_rows`): ALL rows matching the
    * condition, as one JSON-array column per event ("[]" on no match).
    *
    * Scale shape: the multi-row result is pre-aggregated ON THE DIM SIDE
    * (`groupBy(key).agg(sort_array(collect_list(to_json(...))))` over the
    * config-sized table), then broadcast — the fact side stays narrow and
    * never shuffles, and each event row gets the whole match set in one
    * probe. `select` prunes attribute columns before serialization;
    * `caseSensitive = false` lowercases string keys on both sides (the
    * cue option).
    */
  def findRecords(df: DataFrame, table: DataFrame, keys: Seq[String],
                  select: Seq[String], out: String = "records_json",
                  caseSensitive: Boolean = true): DataFrame = {
    def norm(c: Column) = if (caseSensitive) c else lower(c.cast("string"))
    val recs = table
      .groupBy(keys.map(k => norm(col(k)).as(k)): _*)
      .agg(sort_array(collect_list(to_json(struct(select.map(col): _*))))
        .as("_recs"))
    val joined = df.join(broadcast(recs),
      keys.map(k => norm(df(k)) === recs(k)).reduce(_ && _), "left")
    keys.foldLeft(joined)((d, k) => d.drop(recs(k)))
      .withColumn(out,
        concat(lit("["), array_join(coalesce(col("_recs"),
          array().cast("array<string>")), ","), lit("]")))
      .drop("_recs")
  }
}
