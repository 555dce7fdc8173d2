package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** R27 (pyt:1186-1218): raster file-name normalization feeding the
  * catalog build — basename after the last backslash; for web layers,
  * truncate at the LAST "/ImageServer" (the reference uses rfind) and
  * take the segment after the last slash; strip a known ".extension"
  * suffix when present. */
object Names {

  def normalizeRasterName(path: Column, isWeb: Column,
                          extension: Column): Column = {
    val base = substring_index(path, "\\", -1)
    // greedy (.*) anchors the truncation at the LAST /ImageServer, like
    // the reference's rfind; truncation only applies to web layers that
    // actually contain the marker
    val truncated = substring_index(
      regexp_extract(base, "^(.*)/ImageServer", 1), "/", -1)
    val webbed =
      when(isWeb && base.contains("/ImageServer"), truncated).otherwise(base)
    val hasExt = extension.isNotNull && length(extension) > 0 &&
      webbed.endsWith(concat(lit("."), extension))
    when(hasExt,
      webbed.substr(lit(1), length(webbed) - length(extension) - 1))
      .otherwise(webbed)
  }
}
