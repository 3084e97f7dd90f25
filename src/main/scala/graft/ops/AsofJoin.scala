package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the latest right row with
  * `rightTime <= leftTime` within the same key (backward as-of; the
  * time-series join Spark has no native operator for).
  *
  * Strategy (brief preference (a): compose existing ops): tag and UNION
  * the two sides, then one window pass per key ordered by (time, side)
  * carries the most recent right row forward via
  * `last(_, ignoreNulls)`. The whole right payload travels as ONE
  * struct, so multi-column payloads can never mix values from
  * different right rows. ONE shuffle on the key — same cost as any
  * grouped window: no range-explode, no per-key driver loop; skewed
  * keys fall under the same AQE/salting story as every keyed shuffle.
  *
  * Payload columns come back null when no right row precedes the left
  * row (outer as-of semantics). Ties (`rightTime == leftTime`) match,
  * mirroring `<=`.
  */
object AsofJoin {

  import org.apache.spark.sql.types._

  /** Whether Spark can sort values of this type — decides if the payload
    * struct itself can be the deterministic tiebreak or must fall back to
    * its JSON serialization. Implemented locally (not via Catalyst's
    * internal `RowOrdering.isOrderable`, which is not a stable public
    * surface): arrays/structs order iff their element/field types do;
    * maps and variant never order; KNOWN atomic types order; anything
    * unknown-exotic (CalendarInterval, UDTs, future types) defaults to
    * NOT orderable — the `to_json` fallback is always correct, just a
    * little slower to compare, whereas a wrong `true` surfaces as a
    * window-ordering analysis error.
    */
  private[graft] def isOrderable(dt: DataType): Boolean = dt match {
    case _: MapType                       => false
    case v if v.typeName == "variant"     => false
    case a: ArrayType                     => isOrderable(a.elementType)
    case s: StructType                    => s.fields.forall(f => isOrderable(f.dataType))
    case _: NumericType | _: StringType   => true
    case BinaryType | BooleanType | DateType | TimestampType |
        TimestampNTZType | NullType       => true
    case _: DayTimeIntervalType | _: YearMonthIntervalType => true
    case _                                => false
  }

  /** Join direction: Backward attaches the latest right row at or
    * before the left time (the default, `rightTime <= leftTime`);
    * Forward the earliest right row at or after it
    * (`rightTime >= leftTime`); Nearest whichever of the two is closer
    * in absolute time (ties -> the backward match, the convention
    * pandas `merge_asof(direction='nearest')` uses).
    */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  case object Nearest extends Direction

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadPrefix: String = "asof_"): DataFrame =
    asofJoinDir(left, right, key, leftTime, rightTime, Backward, payloadPrefix)

  /** Directional as-of. Forward mirrors Backward: the window simply
    * orders time DESCENDING, so "latest at-or-before" becomes "earliest
    * at-or-after" with the identical one-shuffle plan. Nearest composes
    * the two passes — the forward pass unions fresh right-side rows
    * into the backward result, so it re-shuffles on the key: TWO keyed
    * shuffles total (asserted in AsofJoinSpec), the price of carrying
    * both candidates; still no range explosion and no per-key loop.
    */
  def asofJoinDir(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: Direction,
      payloadPrefix: String = "asof_"): DataFrame = direction match {
    case Nearest =>
      // each pass carries the matched right TIME as extra payload
      // (`__rt`) so the per-row distance compare is local arithmetic;
      // distances go through cast("double") (epoch seconds for
      // timestamps), ties prefer the backward match
      val rAug = right.withColumn("__rt", col(rightTime))
      val back = asofJoinDirImpl(left, rAug, key, leftTime, rightTime,
        forward = false, "__b_")
      val both = asofJoinDirImpl(back, rAug, key, leftTime, rightTime,
        forward = true, "__f_")
      val lt = col(leftTime).cast("double")
      val useBack = col("__f___rt").isNull ||
        (col("__b___rt").isNotNull &&
          (lt - col("__b___rt").cast("double")) <= (col("__f___rt").cast("double") - lt))
      val payloadCols = right.columns.filterNot(c => key.contains(c) || c == rightTime)
      both.select(
        (left.columns.map(col) ++ payloadCols.map(c =>
          when(useBack, col(s"__b_$c")).otherwise(col(s"__f_$c"))
            .as(s"$payloadPrefix$c"))).toIndexedSeq: _*)
    case Backward =>
      asofJoinDirImpl(left, right, key, leftTime, rightTime, forward = false, payloadPrefix)
    case Forward =>
      asofJoinDirImpl(left, right, key, leftTime, rightTime, forward = true, payloadPrefix)
  }

  private def asofJoinDirImpl(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      forward: Boolean,
      payloadPrefix: String): DataFrame = {
    val payloadCols = right.columns.filterNot(c => key.contains(c) || c == rightTime)
    val leftOnly = left.columns.filterNot(key.contains)
    val payloadStruct = struct(payloadCols.map(col).toIndexedSeq: _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))

    // align both sides onto (key..., leftOnly..., __t, __side, __payload)
    val rightAligned = right.select(
      (key.map(col) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"),
          payloadStruct.as("__payload"))).toIndexedSeq: _*)
    val leftAligned = left.select(
      (key.map(col) ++ leftOnly.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side"),
          lit(null).cast(payloadType).as("__payload"))).toIndexedSeq: _*)

    // right (__side=0) sorts before left (__side=1) at equal time → ties
    // match. The payload is the final tiebreak: when several right rows
    // share one (key, rightTime), `last(ignoreNulls)` would otherwise
    // pick whichever the partitioning happened to order last — sorting
    // on the payload makes the winner deterministic across
    // runs/partitionings. Struct comparison when the payload type is
    // orderable; unorderable payloads (maps) fall back to their JSON
    // serialization, which is deterministic and always orderable. (Left
    // rows carry a NULL payload, but they all sort after the rights at
    // equal time and contribute nothing to `last(ignoreNulls)`, so
    // their mutual order is immaterial.)
    val tiebreak =
      if (isOrderable(payloadType)) col("__payload")
      else to_json(col("__payload"))
    // forward = the same plan over time DESCENDING: "latest at-or-
    // before" becomes "earliest at-or-after"; rights still sort before
    // lefts at equal time so ties stay inclusive in both directions
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(timeOrder, col("__side"), tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightAligned.unionByName(leftAligned)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (key.map(col) ++ leftOnly.map(col) ++
          payloadCols.map(c => col(s"__carried.$c").as(s"$payloadPrefix$c"))).toIndexedSeq: _*)
  }
}
