package graft.quality

import scala.math.BigDecimal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Answer eligible data-quality checks from parquet FOOTER statistics —
  * the metadata every sink already wrote — instead of a row scan.
  *
  * At 100× the dq rows are the bench tail: check-count × pruned-scan
  * (SURVEY §20.5). But a `not_null` violation count is exactly the sum of
  * the column's per-row-group null counts, and a range-style check
  * (`within_range`, `not_empty_string`) is often PROVABLY zero from the
  * column's min/max — all sitting in the footers of the staged silver
  * pins and the raw source files, readable in the same cost class as
  * planning the scan (no job, no row reads). The full-scan path remains
  * both the fallback (stats missing, column derived, frame not
  * parquet-backed) and the oracle's semantics; a footer answer must be
  * bit-identical to what the scan would count, so this module only
  * answers when the statistics are EXACT for the question asked:
  *
  *  - `not_null`: sum of null counts, only when every row group of every
  *    file sets the statistic. Exact by definition.
  *  - `within_range(lo, hi)` (violating rows: non-null AND outside
  *    [lo, hi]): answered 0 when every row group's [min, max] ⊆ [lo, hi]
  *    (or the group is all-null). Parquet min/max bound the non-null
  *    values, so containment proves zero violations; anything else —
  *    including truncated or missing stats, NaN-suppressed stats — falls
  *    back to the scan because the COUNT of violators is not derivable.
  *  - `not_empty_string` (violating rows: non-null AND trim = ''): a
  *    violating value is empty or all-spaces, hence lexicographically
  *    `<` any string whose first byte exceeds 0x20. Answered 0 when
  *    every row group's binary MIN starts above 0x20 (a truncated min is
  *    still a valid lower bound, so the proof survives truncation).
  *  - `at_least_n_rows(n)` (violating rows: one iff count(*) < n): row
  *    counts are always present in footers — answered unconditionally.
  *
  * Column mapping: a check column is footer-resolvable when the frame's
  * analyzed plan is a chain of pure rename-projections
  * (`Alias(AttributeReference)` / bare attributes) over ONE unpartitioned
  * parquet relation — a staged [[graft.model.Stage.pinColumnar]] table
  * (identity map) or a bronze/raw rename of the source files. A Filter,
  * Join, Aggregate, or computed expression anywhere in the chain breaks
  * eligibility: the footer no longer describes the frame's rows.
  */
object FooterStats {

  /** Exact per-column footer statistics for one parquet-backed frame,
    * already remapped to the FRAME's column names. */
  final case class TableStats(
      rowCount: Long,
      cols: Map[String, ColStats])

  /** Aggregated over every row group of every data file.
    *  - `nullCount`: Some iff EVERY row group sets it.
    *  - `numRange`:  Some((min, max)) iff every row group with non-null
    *    values has numeric min/max stats (int/long/float/double, no
    *    logical reinterpretation); all-null groups don't contribute.
    *  - `strMinFirstByte`: first byte of the binary/UTF8 minimum, iff
    *    every row group with non-null values has a non-empty binary min.
    *  - `allNull`: true iff the column holds no non-null value at all. */
  final case class ColStats(
      nullCount: Option[Long],
      numRange: Option[(BigDecimal, BigDecimal)],
      strMinFirstByte: Option[Int],
      allNull: Boolean)

  /** (root path, frame-column → footer-column) when `df` is a pure
    * rename-projection chain over one unpartitioned parquet relation. */
  private[quality] def origin(df: DataFrame): Option[(String, Map[String, String])] = {
    def walk(plan: LogicalPlan): Option[(Seq[String], Map[ExprId, String])] =
      plan match {
        case p: Project =>
          walk(p.child).map { case (roots, childMap) =>
            val m = p.projectList.flatMap {
              case a: AttributeReference =>
                childMap.get(a.exprId).map(a.exprId -> _)
              case al @ Alias(ar: AttributeReference, _) =>
                childMap.get(ar.exprId).map(al.exprId -> _)
              case _ => None // computed column: unmapped, not a failure
            }.toMap
            (roots, m)
          }
        case s: SubqueryAlias => walk(s.child)
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation if h.partitionSchema.isEmpty =>
            Some((h.location.rootPaths.map(_.toString),
              l.output.map(a => a.exprId -> a.name).toMap))
          case _ => None
        }
        case _ => None // Filter/Join/Aggregate/...: footer ≠ frame rows
      }
    walk(df.queryExecution.analyzed).collect {
      case (Seq(root), byAttr) =>
        root -> df.queryExecution.analyzed.output
          .flatMap(a => byAttr.get(a.exprId).map(a.name -> _)).toMap
    }
  }

  /** Read every data file's footer under `root` (driver-side; the same
    * metadata cost class as planning the scan) and fold the row-group
    * statistics of the requested FOOTER columns. */
  private[quality] def read(spark: org.apache.spark.sql.SparkSession,
      root: String, footerCols: Set[String]): TableStats = {
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(conf)
    def files(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) files(st.getPath)
        else Seq(st)
      }
    var rowCount = 0L
    // per column: (nullCount, sawUnsetNulls, numMin, numMax, sawBadRange,
    //              strMinByte, sawBadStr, sawNonNull)
    final case class Acc(
        var nulls: Long = 0L, var nullsUnset: Boolean = false,
        var lo: BigDecimal = null, var hi: BigDecimal = null,
        var badRange: Boolean = false,
        var strMin: Int = Int.MaxValue, var badStr: Boolean = false,
        var nonNull: Boolean = false)
    val acc = footerCols.iterator.map(_ -> Acc()).toMap
    files(rootPath).foreach { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val footer = try reader.getFooter finally reader.close()
      footer.getBlocks.forEach { block =>
        rowCount += block.getRowCount
        block.getColumns.forEach { chunk =>
          val path = chunk.getPath
          if (path.size == 1 && footerCols.contains(path.toDotString)) {
            val a = acc(path.toDotString)
            val stats = chunk.getStatistics
            if (stats == null || !stats.isNumNullsSet) a.nullsUnset = true
            else a.nulls += stats.getNumNulls
            val groupAllNull = stats != null && stats.isNumNullsSet &&
              stats.getNumNulls == block.getRowCount
            if (!groupAllNull) {
              a.nonNull = true
              if (stats == null || !stats.hasNonNullValue) {
                a.badRange = true; a.badStr = true
              } else {
                import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
                val pt = chunk.getPrimitiveType
                val ann = pt.getLogicalTypeAnnotation
                val plain = ann == null
                val str = ann != null && ann.isInstanceOf[
                  org.apache.parquet.schema.LogicalTypeAnnotation.StringLogicalTypeAnnotation]
                def num(v: Any): BigDecimal = v match {
                  case i: java.lang.Integer => BigDecimal(i.intValue)
                  case l: java.lang.Long => BigDecimal(l.longValue)
                  case f: java.lang.Float => BigDecimal.decimal(f.floatValue)
                  case d: java.lang.Double => BigDecimal(d.doubleValue)
                }
                pt.getPrimitiveTypeName match {
                  case INT32 | INT64 | FLOAT | DOUBLE if plain =>
                    val (mn, mx) = (num(stats.genericGetMin), num(stats.genericGetMax))
                    a.lo = if (a.lo == null || mn < a.lo) mn else a.lo
                    a.hi = if (a.hi == null || mx > a.hi) mx else a.hi
                    a.badStr = true
                  case BINARY if str =>
                    val bytes = stats.genericGetMin
                      .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes
                    if (bytes.isEmpty) a.badStr = true
                    else a.strMin = math.min(a.strMin, bytes(0) & 0xff)
                    a.badRange = true
                  case _ => a.badRange = true; a.badStr = true
                }
              }
            }
          }
        }
      }
    }
    TableStats(rowCount, acc.map { case (name, a) =>
      name -> ColStats(
        nullCount = if (a.nullsUnset) None else Some(a.nulls),
        numRange =
          if (a.badRange || !a.nonNull || a.lo == null) None
          else Some((a.lo, a.hi)),
        strMinFirstByte =
          if (a.badStr || !a.nonNull || a.strMin == Int.MaxValue) None
          else Some(a.strMin),
        allNull = !a.nonNull)
    })
  }

  /** Footer statistics for `df`'s columns named in `cols`, or None when
    * the frame is not footer-resolvable at all. Columns of `cols` that
    * don't map to a footer column are simply absent from the result. */
  def forColumns(df: DataFrame, cols: Set[String]): Option[TableStats] =
    origin(df).map { case (root, byName) =>
      val wanted = byName.filter { case (frameCol, _) => cols(frameCol) }
      val stats = read(df.sparkSession, root, wanted.values.toSet)
      TableStats(stats.rowCount,
        wanted.flatMap { case (frameCol, footerCol) =>
          stats.cols.get(footerCol).map(frameCol -> _)
        })
    }
}
