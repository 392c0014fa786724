package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.urls.UrlOps

/**
 * Native Catalyst expressions for the hot URL path (PLANS.md "non-codegen
 * islands"): unlike a Scala UDF — which forces an internal↔external row
 * conversion and a lambda call outside the generated code — these emit a
 * direct static call into the generated Java, so the enqueue projection
 * (canonicalize → host → xxhash64 bucket) stays inside one
 * WholeStageCodegen span end to end.
 */
abstract class UrlStringExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  // canonicalization rejects malformed input ⇒ null even for non-null child
  override def nullable: Boolean = true
  /** static method name on graft.urls.UrlOps */
  protected def fn: String
  protected def evalFn(u: UTF8String): UTF8String

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else evalFn(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = graft.urls.UrlOps.$fn(${c.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }
}

/** `graft_canonicalize(url)` — Master.generateId identity (Master.scala:34-36). */
case class CanonicalizeUrl(child: Expression) extends UrlStringExpr {
  override protected def fn: String = "canon"
  override protected def evalFn(u: UTF8String): UTF8String = UrlOps.canon(u)
  override def prettyName: String = "graft_canonicalize"
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

/** `graft_host(url)` — authority extraction (robots/politeness key). */
case class HostOfUrl(child: Expression) extends UrlStringExpr {
  override protected def fn: String = "host"
  override protected def evalFn(u: UTF8String): UTF8String = UrlOps.host(u)
  override def prettyName: String = "graft_host"
  override protected def withNewChildInternal(newChild: Expression): HostOfUrl =
    copy(child = newChild)
}

/** Session registration so the expressions are reachable through the public
  * `call_function` surface (the sanctioned FunctionRegistry extension point,
  * same mechanism as SparkSessionExtensions.injectFunction). Idempotent. */
object UrlExpressions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_canonicalize",
      es => CanonicalizeUrl(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_host",
      es => HostOfUrl(es.head), "scala_udf")
  }
}
