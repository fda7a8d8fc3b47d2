package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst realization of the git-blob content hash (SURVEY X7,
  * reference `/root/reference/olake/ingest/arena.py:11-45`): normalize
  * (CRLF→LF, strip trailing whitespace per line, strip trailing blank
  * lines) then SHA-256 of `"blob <bytelen>\0<body>"`.
  *
  * Semantically identical to the pure-built-in column form
  * [[graft.functions.Fns.gitBlobHash]] (property-tested equal), but one
  * codegen'd call instead of a 3-deep regexp_replace chain — the
  * SURVEY §7 "upgrade to a custom Expression with codegen" path. Codegen
  * emits a static call into [[GitBlobHashExpr.hash]]; the expression
  * stays inside whole-stage codegen (no CodegenFallback).
  */
case class GitBlobHashExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_git_blob_hash"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      GitBlobHashExpr.hash(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.plans.GitBlobHashExpr.hash($c.toString()))")

  override protected def withNewChildInternal(
      newChild: Expression): GitBlobHashExpr = copy(child = newChild)
}

object GitBlobHashExpr {

  /** JVM-side hash; the regexes mirror Fns.normalizeSource exactly. */
  def hash(s: String): String = {
    val norm = s.replace("\r\n", "\n")
      .replaceAll("(?m)[ \t]+$", "")
      .replaceAll("\n+$", "")
    val body = norm.getBytes(StandardCharsets.UTF_8)
    val header = s"blob ${body.length}\u0000"
      .getBytes(StandardCharsets.UTF_8)
    val md = MessageDigest.getInstance("SHA-256")
    md.update(header)
    md.update(body)
    md.digest().map("%02x".format(_)).mkString
  }

  val identifier: FunctionIdentifier =
    FunctionIdentifier("graft_git_blob_hash")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GitBlobHashExpr].getCanonicalName, "graft_git_blob_hash")

  /** Builder casts the single argument to string (the implicit-cast
    * behavior ImplicitCastInputTypes would supply — that trait is
    * private[sql] in Spark 4). */
  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1,
      "graft_git_blob_hash takes exactly one argument")
    val c = children.head
    GitBlobHashExpr(
      if (c.dataType == StringType) c else Cast(c, StringType))
  }
}
