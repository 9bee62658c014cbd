package graft.plans

/** The maintenance / materialized-view statement PARSER — split from
  * [[GraftTables]]'s execution (r11 verdict item 7) so adding a verb
  * means adding one case class and one parse function here, with the
  * lowering untouched. Parsing is total over its input: a recognized
  * verb with malformed arguments FAILS here with the verb's contract,
  * an unrecognized statement returns None and delegates to Spark.
  *
  * Statements are recognized by their leading keywords (one shared
  * tokenizer pass), then each verb's own parse function consumes the
  * argument tail — table identifiers keep their raw spelling
  * (backticks included) because resolution is the EXECUTOR's job
  * ([[GraftDml.splitIdentifier]] / resolveName need the session).
  */
private[plans] object GraftVerbs {

  sealed trait Verb

  final case class Vacuum(table: String,
      retainHours: Option[Long]) extends Verb
  final case class Optimize(table: String,
      minDeltas: Option[Int]) extends Verb
  final case class DescribeHistory(table: String) extends Verb
  final case class RetirePartitions(table: String,
      beforeTs: String) extends Verb
  final case class SetPartitionSpec(table: String, unit: String,
      col: String) extends Verb
  final case class DropPartitionSpec(table: String) extends Verb
  /** `bound` is the raw timestamp string (Left) or version (Right). */
  final case class ExpireHistory(table: String,
      bound: Either[String, Long]) extends Verb
  /** RESTORE TABLE t TO VERSION [AS OF] n | TO TIMESTAMP [AS OF] 'ts'
    * — write-side time travel (`bound`: Right = version, Left = the
    * raw timestamp string, resolved by the executor in session zone).
    */
  final case class RestoreTable(table: String,
      bound: Either[String, Long]) extends Verb
  final case class ShowFiles(table: String) extends Verb
  final case class ShowPartitions(table: String) extends Verb
  final case class ShowChanges(table: String, from: Long,
      to: Option[Long]) extends Verb
  /** CREATE MATERIALIZED VIEW — select list already validated against
    * the AggView state contract (keys + count(*) cnt + sum(col)
    * total); `name` is lowercased, keys/valueCol keep their spelling.
    */
  final case class CreateMv(name: String, keys: Seq[String],
      valueCol: String, base: String,
      /** store append-only min/max partials too (r13):
        * `min(col) AS vmin, max(col) AS vmax` in the select list. */
      minMax: Boolean = false) extends Verb
  final case class RefreshMv(name: String) extends Verb
  /** ALTER MATERIALIZED VIEW v REBUILD — re-seed from the base's
    * CURRENT snapshot (the one-statement remedy for an invalidated
    * min/max view; also just a forced full refresh). */
  final case class RebuildMv(name: String) extends Verb
  final case class RefreshAllMv(base: String) extends Verb
  final case class DropMv(name: String) extends Verb

  // ---- per-verb recognizers ------------------------------------------

  private val VacuumRe =
    """(?is)\s*VACUUM\s+([\w.`]+)(?:\s+RETAIN\s+(\d+)\s+HOURS?)?\s*;?\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+([\w.`]+)(?:\s+MIN\s+DELTAS\s+(\d+))?\s*;?\s*""".r
  private val HistoryRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  private val RetireRe =
    ("""(?is)\s*RETIRE\s+PARTITIONS\s+([\w.`]+)\s+BEFORE\s+""" +
      """TIMESTAMP\s+'([^']+)'\s*;?\s*""").r
  private val SetPartRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+SET\s+PARTITION\s+SPEC\s*""" +
      """\(\s*(\w+)\s*\(\s*`?(\w+)`?\s*\)\s*\)\s*;?\s*""").r
  private val DropPartRe =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+PARTITION\s+""" +
      """SPEC\s*;?\s*""").r
  private val ExpireRe =
    ("""(?is)\s*EXPIRE\s+HISTORY\s+([\w.`]+)\s+BEFORE\s+""" +
      """(?:TIMESTAMP\s+'([^']+)'|(-?\d+))\s*;?\s*""").r
  private val RestoreRe =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.`]+)\s+TO\s+""" +
      """(?:VERSION\s+(?:AS\s+OF\s+)?(\d+)|""" +
      """TIMESTAMP\s+(?:AS\s+OF\s+)?'([^']+)')\s*;?\s*""").r
  private val ShowFilesRe =
    """(?is)\s*SHOW\s+FILES\s+([\w.`]+)\s*;?\s*""".r
  private val ShowPartsRe =
    """(?is)\s*SHOW\s+PARTITIONS\s+([\w.`]+)\s*;?\s*""".r
  private val ShowChangesRe =
    ("""(?is)\s*SHOW\s+CHANGES\s+([\w.`]+)\s+FROM\s+(\d+)""" +
      """(?:\s+TO\s+(\d+))?\s*;?\s*""").r
  private val CreateMvRe =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(`?\w+`?)\s+AS\s+""" +
      """SELECT\s+(.+?)\s+FROM\s+([\w.`]+)\s+GROUP\s+BY\s+(.+?)\s*;?\s*""").r
  private val RefreshMvRe =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(`?\w+`?)\s*;?\s*""".r
  private val RebuildMvRe =
    ("""(?is)\s*ALTER\s+MATERIALIZED\s+VIEW\s+(`?\w+`?)\s+""" +
      """REBUILD\s*;?\s*""").r
  private val RefreshAllMvRe =
    ("""(?is)\s*REFRESH\s+ALL\s+MATERIALIZED\s+VIEWS\s+ON\s+""" +
      """([\w.`]+)\s*;?\s*""").r
  private val DropMvRe =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(`?\w+`?)\s*;?\s*""".r

  private val CntItem = """(?is)count\s*\(\s*(?:\*|1)\s*\)\s+AS\s+cnt""".r
  private val SumItem = """(?is)sum\s*\(\s*`?(\w+)`?\s*\)\s+AS\s+total""".r
  private val MinItem = """(?is)min\s*\(\s*`?(\w+)`?\s*\)\s+AS\s+vmin""".r
  private val MaxItem = """(?is)max\s*\(\s*`?(\w+)`?\s*\)\s+AS\s+vmax""".r
  private val KeyItem = """`?(\w+)`?""".r

  private def unquote(n: String): String =
    n.stripPrefix("`").stripSuffix("`")

  /** Split on top-level commas (parens nest). */
  private[plans] def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case ch => cur += ch
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Validate a CREATE MATERIALIZED VIEW select list / GROUP BY
    * against the AggView state contract; fails with the contract on
    * any other shape (a recognized verb never half-parses).
    */
  private def parseCreateMv(name0: String, selectList: String,
      base: String, groupBy: String): CreateMv = {
    val contract = "CREATE MATERIALIZED VIEW supports exactly " +
      "SELECT <group cols>, count(*) AS cnt, sum(<col>) AS total " +
      "[, min(<col>) AS vmin, max(<col>) AS vmax] " +
      "FROM <base> GROUP BY <group cols> (AggView stores count + " +
      "decimal-sum partials under those names; vmin/vmax — both, on " +
      "the same column — opt into APPEND-ONLY min/max partials that " +
      "invalidate on the first retraction event)"
    var keys = Vector.empty[String]
    var valueCol: Option[String] = None
    var minCol: Option[String] = None
    var maxCol: Option[String] = None
    var hasCnt = false
    splitTopLevel(selectList).foreach {
      case CntItem() => hasCnt = true
      case SumItem(v) =>
        if (valueCol.nonEmpty) GraftDml.fail(contract)
        valueCol = Some(v)
      case MinItem(v) =>
        if (minCol.nonEmpty) GraftDml.fail(contract)
        minCol = Some(v)
      case MaxItem(v) =>
        if (maxCol.nonEmpty) GraftDml.fail(contract)
        maxCol = Some(v)
      case KeyItem(k) => keys = keys :+ k
      case other =>
        GraftDml.fail(s"unsupported select item '$other' — $contract")
    }
    val minMax = (minCol, maxCol) match {
      case (None, None) => false
      case (Some(mn), Some(mx))
          if valueCol.exists(v => mn.equalsIgnoreCase(v) &&
            mx.equalsIgnoreCase(v)) => true
      case _ => GraftDml.fail(contract)
    }
    val groupKeys = splitTopLevel(groupBy).map(g =>
      KeyItem.unapplySeq(g).map(_.head)
        .getOrElse(GraftDml.fail(
          s"unsupported GROUP BY item '$g' — $contract")))
    if (!(hasCnt && valueCol.isDefined && keys.nonEmpty &&
        keys.map(_.toLowerCase) == groupKeys.map(_.toLowerCase).toVector))
      GraftDml.fail(contract)
    CreateMv(unquote(name0).toLowerCase, keys, valueCol.get, base,
      minMax)
  }

  /** One statement → one Verb, or None for "not ours". */
  def parse(sqlText: String): Option[Verb] = sqlText match {
    case VacuumRe(t, hours) =>
      Some(Vacuum(t, Option(hours).map(_.toLong)))
    case OptimizeRe(t, minDeltas) =>
      Some(Optimize(t, Option(minDeltas).map(_.toInt)))
    case HistoryRe(t) => Some(DescribeHistory(t))
    case RetireRe(t, ts) => Some(RetirePartitions(t, ts))
    case SetPartRe(t, unit, c) =>
      Some(SetPartitionSpec(t, unit.toLowerCase, c))
    case DropPartRe(t) => Some(DropPartitionSpec(t))
    case ExpireRe(t, ts, num) =>
      Some(ExpireHistory(t,
        if (ts != null) Left(ts) else Right(num.toLong)))
    case RestoreRe(t, v, ts) =>
      Some(RestoreTable(t,
        if (v != null) Right(v.toLong) else Left(ts)))
    case ShowFilesRe(t) => Some(ShowFiles(t))
    case ShowPartsRe(t) => Some(ShowPartitions(t))
    case ShowChangesRe(t, from, to) =>
      Some(ShowChanges(t, from.toLong, Option(to).map(_.toLong)))
    case CreateMvRe(name0, selectList, base, groupBy) =>
      Some(parseCreateMv(name0, selectList, base, groupBy))
    case RefreshMvRe(name0) => Some(RefreshMv(unquote(name0).toLowerCase))
    case RebuildMvRe(name0) => Some(RebuildMv(unquote(name0).toLowerCase))
    case RefreshAllMvRe(base) => Some(RefreshAllMv(base))
    case DropMvRe(name0) => Some(DropMv(unquote(name0).toLowerCase))
    case _ => None
  }
}
