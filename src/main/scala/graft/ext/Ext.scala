package graft.ext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration for the Catalyst extensions.
  *
  * Two front doors:
  *   - [[Ext.register]]: runtime registration into an existing session's
  *     FunctionRegistry (what the query builders use — the driver owns
  *     session construction, SURVEY.md §0 [DRV]).
  *   - [[GraftExtensions]]: `SparkSessionExtensions` injection for
  *     production sessions built with
  *     `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *     `spark.sql.extensions=graft.ext.GraftExtensions`.
  */
object Ext {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (es => CosineSimilarity(es(0), es(1))),
    "byte_stats" -> (es => ByteStats(es.head)),
    "sorted_intersect_count" -> (es => SortedIntersectCount(es(0), es(1))),
    "poly_hash" -> (es => PolyHash(es.head)),
    "poly_hash_shingles" -> (es => PolyHashShingles(es(0), es(1))),
    "point_in_quad" -> (es => PointInQuad(es)),
    "cell_cover" -> (es => CellCover(es)),
    "argmax_cosine" -> (es => ArgmaxCosine(es(0), es(1))),
    "lsh_bucket" -> (es => LshBucket(es.head)),
    "make_wkb" -> (es => MakeWkb(es.head)),
    "point_in_wkb" -> (es => PointInWkb(es(0), es(1), es(2))),
    "cell_cover_wkb" -> (es => CellCoverWkb(es(0), es(1), es(2))),
    "wkb_stats" -> (es => WkbStats(es.head)),
    "wkb_geojson" -> (es => WkbGeoJson(es.head)))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    Ext.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.ext", name), builder))
    }
}
