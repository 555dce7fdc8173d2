package graft.catalog

import graft.codec.{RangeCodec, Rfc4180}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The mosaic-catalog tools: encode/decode between the decoded
  * array-of-structs classification and the reference's stored CSV-string
  * columns (R13–R16, pyt:929-936/1279/1308-1332), per-field diff
  * detection (R17, pyt:245-273), and update-by-predicate rewrites (R18,
  * pyt:318-324) with the reference's validations (V2 contiguity
  * pyt:199-218, V3 coverage snap/error pyt:307-314).
  *
  * Scale posture: the catalog is dimension-sized; every operation here
  * is a narrow projection or a broadcast-friendly equi-join keyed on
  * `name`. Updates are immutable rewrites (when(pred, new).otherwise(old))
  * — the Delta-style MERGE shape, expressed as a projection so Catalyst
  * folds it into the scan. */
object Catalog {

  /** Encode a decoded catalog (name, ranges: array<struct<label,lo,hi,out>>)
    * to the stored string form (R13/R14/R16-inverse). `keep` carries
    * extra pass-through columns (e.g. the mosaic Title). */
  def encode(decoded: DataFrame, nameCol: String = "layer",
             rangesCol: String = "ranges",
             keep: Seq[String] = Nil): DataFrame =
    decoded.select(
      Seq(col(nameCol).as("name"),
        RangeCodec.encodeRanges(col(rangesCol)).as("input_ranges"),
        Rfc4180.encodeList(transform(col(rangesCol), r => r("label")))
          .as("range_labels"),
        array_join(transform(col(rangesCol), r => r("out").cast(StringType)),
          ",").as("output_values")) ++ keep.map(col): _*)

  /** Decode stored strings back to the array-of-structs form (R15/R16,
    * pyt:161-177: positional zip of labels / range pairs / outputs). */
  def decodeRangesCol: Column = {
    val pairs = RangeCodec.decodeRanges(col("input_ranges"))
    val labels = Rfc4180.decodeList(col("range_labels"))
    val outs = transform(split(col("output_values"), ","),
      s => s.try_cast(IntegerType))
    transform(pairs, (p, i) => struct(
      try_element_at(labels, i + 1).as("label"),
      p("lo").as("lo"), p("hi").as("hi"),
      try_element_at(outs, i + 1).as("out")))
  }

  def decode(encoded: DataFrame): DataFrame =
    encoded.withColumn("ranges", decodeRangesCol)

  /** R17: per-field diff between two catalog versions keyed on `name`.
    * Emits one row per changed field (null-safe comparison). */
  def diff(oldCat: DataFrame, newCat: DataFrame,
           fields: Seq[String]): DataFrame = {
    val o = oldCat.select(col("name") +: fields.map(f => col(f).as(s"o_$f")): _*)
    val n = newCat.select(col("name") +: fields.map(f => col(f).as(s"n_$f")): _*)
    val entries = fields.map(f => struct(
      lit(f).as("field"), col(s"o_$f").as("old_value"),
      col(s"n_$f").as("new_value")))
    o.join(n, "name")
      .select(col("name"), explode(array(entries: _*)).as("d"))
      .select(col("name"), col("d.field").as("field"),
              col("d.old_value").as("old_value"),
              col("d.new_value").as("new_value"))
      .filter(!(col("old_value") <=> col("new_value")))
  }

  /** UpdateWROLayerInfo (pyt:345-556): rewrite Title/Description/Url/
    * Metadata for one catalog row by name. Reference semantics:
    *  - V4 (pyt:480-493): Url and Metadata (also a URL field) must begin
    *    with http:// or https:// when non-empty — hard error;
    *  - empty strings normalize to null before the write (pyt:536-543;
    *    the reference's `if metadata == "": url = None` line is an
    *    obvious transcription slip we do not reproduce);
    *  - wholesale update-by-predicate of the four fields (pyt:547-550),
    *    expressed as an immutable projection.
    * Parameter validation is plan-build-time plain Scala — these are UI
    * parameters in the reference, validated before execute. */
  def updateLayerInfo(cat: DataFrame, name: String, title: String,
                      description: String, url: String,
                      metadata: String): DataFrame = {
    def checkUrl(v: String, field: String): Unit =
      if (v != null && v.nonEmpty &&
          !v.toLowerCase.startsWith("http://") &&
          !v.toLowerCase.startsWith("https://"))
        throw new IllegalArgumentException(
          s"$field must begin with http:// or https://")
    checkUrl(url, "Url")
    checkUrl(metadata, "Metadata")
    def norm(v: String): Column =
      if (v == null || v.isEmpty) lit(null).cast(StringType) else lit(v)
    val isTarget = col("name") === lit(name)
    Seq("title" -> title, "description" -> description,
        "url" -> url, "metadata" -> metadata)
      .foldLeft(cat) { case (df, (field, v)) =>
        df.withColumn(field, when(isTarget, norm(v)).otherwise(col(field)))
      }
  }

  /** Delta-style multi-row MERGE — R18 generalized from the one-row
    * literal edit to the shape pyt:879-885's per-layer write-back loop
    * implies at scale: `updates` carries the encoded catalog schema
    * keyed on `name`; matched rows REWRITE their encoded fields,
    * unmatched update rows INSERT, untouched catalog rows KEEP (each
    * tagged in the `action` column). Expressed as a broadcast left join
    * (rewrite) unioned with a broadcast anti join (insert) rather than
    * one full-outer join: Spark cannot broadcast a full outer, so that
    * spelling would sort-merge-shuffle the catalog — this one keeps
    * every join build side dimension-sized and broadcast. */
  def mergeCatalog(encodedCat: DataFrame, updates: DataFrame): DataFrame = {
    val fields = Seq("input_ranges", "range_labels", "output_values")
    val u = updates.select(col("name").as("u_name") +:
      fields.map(f => col(f).as(s"u_$f")): _*)
    // field rewrite keys on the MATCH (u_name non-null), not on each
    // field value — an update row carrying a legitimate NULL field
    // writes NULL, the standard MERGE … UPDATE SET semantics (a
    // coalesce here would silently keep the old value instead)
    val rewritten = encodedCat
      .join(broadcast(u), col("name") === col("u_name"), "left")
      .select(col("name") +:
        fields.map(f => when(col("u_name").isNotNull, col(s"u_$f"))
          .otherwise(col(f)).as(f)) :+
        when(col("u_name").isNotNull, lit("update")).otherwise(lit("keep"))
          .as("action"): _*)
    val inserts = updates
      .join(broadcast(encodedCat.select(col("name").as("c_name"))),
        col("name") === col("c_name"), "left_anti")
      .select(col("name") +: fields.map(col) :+
        lit("insert").as("action"): _*)
    rewritten.unionByName(inserts)
  }

  /** SCD-2 history maintenance over the catalog — the versioned sibling
    * of [[mergeCatalog]] (which overwrites; this one never loses a
    * version, the audit shape a mosaic-catalog service actually wants
    * for `pyt:245-273`'s change reports). `hist` carries the encoded
    * fields plus (version, valid_from_us, valid_to_us, is_current);
    * applying `updates` at `tsUs` CLOSES each matched current row
    * (valid_to = ts, is_current = 0) and OPENS a successor at
    * version+1 — a brand-new name opens at version 1. Both joins
    * broadcast the dimension-sized updates/current sides; history rows
    * already closed pass through untouched. */
  def scd2Apply(hist: DataFrame, updates: DataFrame, tsUs: Long): DataFrame = {
    val fields = Seq("input_ranges", "range_labels", "output_values")
    val cur = hist.filter(col("is_current") === 1)
    val curOut = cur
      .join(broadcast(updates.select(col("name").as("u_name"))),
        col("name") === col("u_name"), "left")
      .select(Seq(col("name")) ++ fields.map(col) ++ Seq(
        col("version"), col("valid_from_us"),
        when(col("u_name").isNotNull, lit(tsUs))
          .otherwise(col("valid_to_us")).as("valid_to_us"),
        when(col("u_name").isNotNull, lit(0))
          .otherwise(col("is_current")).as("is_current")): _*)
    val opened = updates
      .join(broadcast(cur.select(col("name").as("c_name"),
          col("version").as("c_version"))),
        col("name") === col("c_name"), "left")
      .select(Seq(col("name")) ++ fields.map(col) ++ Seq(
        (coalesce(col("c_version"), lit(0)) + 1).as("version"),
        lit(tsUs).as("valid_from_us"),
        lit(null).cast("long").as("valid_to_us"),
        lit(1).as("is_current")): _*)
    hist.filter(col("is_current") === 0)
      .unionByName(curOut)
      .unionByName(opened)
  }

  /** UpdateWroClassification (pyt:222-330): apply an edited
    * classification to one catalog row, with the reference's validations:
    *  - V3 snap (pyt:309-311): the first range's lo is snapped to the
    *    raster minimum (auto-fix; the reference warns — surfaced here as
    *    data, the `snapped` 0/1 output column, R30);
    *  - V3 error (pyt:312-314): the last range's hi must exceed the
    *    raster maximum — half-open ranges must cover the true max.
    *    Faithful quirk: the reference's snap/error is an if/ELIF, so the
    *    coverage error is only raised when NO snap happened (a snapped
    *    edit with short coverage warns and writes anyway);
    *  - V2 (pyt:199-218): edited ranges must be contiguous.
    * `newRanges` is the edited array<struct<label,lo,hi,out>> (typically
    * literal-built from user input); `stats` is a one-row DataFrame with
    * the layer's raster statistics as columns `mn`/`mx` — kept as a
    * DataFrame so the statistics stay computed in-plan (no driver-side
    * collect, mirroring pyt:303-304's GetRasterProperties without the
    * round-trip). Returns the rewritten catalog (immutable R18
    * update-by-predicate). */
  def updateClassification(encodedCat: DataFrame, name: String,
                           newRanges: Column, stats: DataFrame): DataFrame = {
    val mn = col("mn")
    val mx = col("mx")
    val snapped = transform(newRanges, (r, i) => struct(
      r("label").as("label"),
      when(i === 0, mn).otherwise(r("lo")).as("lo"),
      r("hi").as("hi"), r("out").as("out")))
    val lastHi = element_at(snapped, size(snapped))("hi")
    // R30: did the snap fire? The reference's test is str(lo) != str(min)
    // (pyt:309) — a value comparison here; <=> so a null given lo counts
    // as differing rather than poisoning the flag
    val wasSnapped = !(element_at(newRanges, 1)("lo") <=> mn)
    // NULL-hostile validations: a NULL condition (empty layer -> null
    // mn/mx, null bounds) must ERROR like the reference, not silently
    // skip the raise_error branch and emit a half-updated row
    val validated =
      when(coalesce(mn.isNull || mx.isNull, lit(true)),
        raise_error(lit("raster statistics unavailable for update")))
      .when(coalesce(!RangeCodec.isContiguous(snapped), lit(true)),
        raise_error(lit("edited ranges are not contiguous")))
      // if/ELIF (pyt:309-314): coverage is only checked when the snap
      // did NOT fire; && short-circuits the null-hostile coalesce so a
      // snapped edit with a null/short last hi still writes (warn path)
      .when(coalesce(!wasSnapped && (lastHi <= mx), lit(true)),
        raise_error(concat(lit("classification must cover the raster "),
          lit("maximum: last hi "), lastHi.cast(StringType),
          lit(" <= max "), mx.cast(StringType))))
      .otherwise(snapped)
    val enc = encode(
      stats.select(lit(name).as("layer"), validated.as("ranges"),
        wasSnapped.cast(IntegerType).as("snapped")),
      keep = Seq("snapped"))
    // broadcast the 1-row edited encoding; rewrite is a projection.
    // (Catalyst constant-folds the e_name key to a literal, so this plans
    // as a BroadcastNestedLoopJoin — of a ONE-row build side, i.e. a
    // per-row predicate, not a quadratic join.)
    encodedCat.as("c")
      .join(broadcast(enc.as("e")
          .withColumnRenamed("name", "e_name")),
        col("c.name") === col("e_name"), "left")
      .select(col("c.name").as("name"),
        coalesce(col("e.input_ranges"), col("c.input_ranges")).as("input_ranges"),
        coalesce(col("e.range_labels"), col("c.range_labels")).as("range_labels"),
        coalesce(col("e.output_values"), col("c.output_values")).as("output_values"),
        coalesce(col("e.snapped"), lit(0)).as("snapped"))
  }
}
