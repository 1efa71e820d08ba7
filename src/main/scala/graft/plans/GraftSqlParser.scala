package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, Expression, SortOrder}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL front door for the native group-wise top-K operator — the parser
  * tier of `SparkSessionExtensions` (function / optimizer-rule / strategy
  * tiers are exercised by the other GraftExtensions hooks):
  *
  * {{{
  *   GRAFT TOPK <k> PER <key[, key…]> ORDER BY <col [ASC|DESC]>[, …] FROM <relation>
  * }}}
  *
  * parses to a [[TopKPerKey]] logical node over `SELECT * FROM <relation>`
  * with UNRESOLVED key/ordering attributes — the analyzer's standard
  * ResolveReferences pass binds them, and TopKStrategy plans the
  * partial/final bounded-heap pair. Every other statement delegates
  * verbatim to Spark's parser, so the dialect is purely additive.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseTopK(sqlText, delegate)
      .getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    GraftSqlParser.parseTopK(sqlText, delegate)
      .getOrElse(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {
  // (?is): case-insensitive + DOTALL so the relation clause can span lines
  private val TopKStmt =
    """(?is)^\s*GRAFT\s+TOPK\s+(\d+)\s+PER\s+(.+?)\s+ORDER\s+BY\s+(.+?)\s+FROM\s+(.+?)\s*;?\s*$""".r

  private[plans] def parseTopK(sqlText: String,
                               delegate: ParserInterface): Option[LogicalPlan] =
    sqlText match {
      case TopKStmt(kStr, keyStr, ordStr, rest) =>
        val keys = keyStr.split(",").toSeq
          .map(s => UnresolvedAttribute(s.trim): Expression)
        val ordering = ordStr.split(",").toSeq.map { o =>
          val (name, dir) = o.trim.split("""\s+""") match {
            case Array(n) => (n, Ascending)
            case Array(n, d) if d.equalsIgnoreCase("ASC") => (n, Ascending)
            case Array(n, d) if d.equalsIgnoreCase("DESC") => (n, Descending)
            case other => throw new IllegalArgumentException(
              s"GRAFT TOPK: cannot parse ordering term '${other.mkString(" ")}'" +
                " — expected <column> [ASC|DESC]")
          }
          SortOrder(UnresolvedAttribute(name), dir)
        }
        Some(TopKPerKey(keys, ordering, kStr.toInt,
          delegate.parsePlan(s"SELECT * FROM $rest")))
      case _ => None
    }
}
