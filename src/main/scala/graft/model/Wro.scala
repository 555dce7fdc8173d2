package graft.model

import org.apache.spark.sql.types._

/** The mosaic-dataset layer catalog: one row per raster layer, with the
  * classification metadata the reference stores as CSV-encoded strings.
  *
  * Schema mirrors the reference's `outMoFields`
  * (WROS/Weighted Raster Overlay Service.pyt:592-603) plus the mosaic
  * built-in `Name` column used as the lookup key (pyt:122, pyt:151).
  * List-valued logical columns are physically CSV strings in the stored
  * form (pyt:929-936, pyt:1279, pyt:1308-1332); the engine works on the
  * decoded array-of-struct form and encodes only at the storage edge.
  */
object WroSchema {
  /** Decoded classification: parallel positional arrays zipped into one
    * array of structs (label i <-> InputRanges pair (2i, 2i+1) <->
    * OutputValues i; pyt:168-177). Ranges are half-open [lo, hi)
    * (max-exclusive, pyt:929 comments). */
  val rangeSpec: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("lo", DoubleType),
    StructField("hi", DoubleType),
    StructField("out", IntegerType)
  ))

  /** Stored (encoded) catalog schema — pyt:592-603 + Name. */
  val catalog: StructType = StructType(Seq(
    StructField("Name", StringType),              // mosaic built-in key
    StructField("Title", StringType),             // pyt:593
    StructField("Description", StringType),       // pyt:594
    StructField("Url", StringType),               // pyt:595
    StructField("InputRanges", StringType),       // CSV "lo1,hi1,..." pyt:596
    StructField("NoDataRanges", StringType),      // pyt:597 (declared only)
    StructField("RangeLabels", StringType),       // RFC-4180 CSV, pyt:598
    StructField("NoDataRangeLabels", StringType), // pyt:599 (declared only)
    StructField("OutputValues", StringType),      // CSV ints 0-9, pyt:600
    StructField("Metadata", StringType),          // pyt:601
    StructField("dataset_id", StringType)         // pyt:602
  ))

  /** Columns the update tools require to be present before running
    * (field-presence validation, pyt:137-147, pyt:440-449). */
  val requiredClassificationFields: Seq[String] =
    Seq("Title", "RangeLabels", "InputRanges", "OutputValues")
  val requiredInfoFields: Seq[String] =
    Seq("Title", "Description", "Url", "Metadata")
}

/** A decoded catalog row (typed view). */
case class WroLayer(
    Name: String,
    Title: String,
    ranges: Seq[WroRange])

/** One half-open classification range [lo, hi) -> suitability `out`. */
case class WroRange(label: String, lo: Double, hi: Double, out: Int)
