package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import scala.collection.mutable

/** A recording `java.sql.Connection` built from dynamic proxies — the
  * test stand-in for sqlite-jdbc (absent in this zero-egress build).
  * Captures everything the K1 transport emits: DDL statements, prepared
  * insert SQL, batch-flushed rows, and transaction events
  * (setAutoCommit / commit / rollback), so specs can assert both the
  * statement stream and the per-table transaction envelope.
  */
class JdbcRecorder {
  val executed = mutable.Buffer[String]()      // Statement.execute calls
  val prepared = mutable.Buffer[String]()      // prepareStatement SQL
  val inserted = mutable.Buffer[Vector[Any]]() // rows flushed by executeBatch
  val txEvents = mutable.Buffer[String]()      // transaction lifecycle
  var autoCommit = true

  private def proxy[T](cls: Class[T])(
      f: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          f.applyOrElse((m.getName, a), (_: (String, Array[AnyRef])) => null)
        }
      }).asInstanceOf[T]

  private def newPrepared(): java.sql.PreparedStatement = {
    val current = mutable.ArrayBuffer[Any]()
    val pending = mutable.Buffer[Vector[Any]]()
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("setObject", args) =>
        val idx = args(0).asInstanceOf[Integer].intValue
        while (current.size < idx) current += null
        current(idx - 1) = args(1)
        null
      case ("addBatch", _) =>
        pending += current.toVector; current.clear(); null
      case ("executeBatch", _) =>
        inserted ++= pending
        val counts = Array.fill(pending.size)(1)
        pending.clear()
        counts
    }
  }

  val connection: java.sql.Connection = proxy(classOf[java.sql.Connection]) {
    case ("createStatement", _) =>
      proxy(classOf[java.sql.Statement]) {
        case ("execute", args) =>
          executed += args(0).asInstanceOf[String]; java.lang.Boolean.TRUE
      }
    case ("prepareStatement", args) =>
      prepared += args(0).asInstanceOf[String]; newPrepared()
    case ("getAutoCommit", _) => java.lang.Boolean.valueOf(autoCommit)
    case ("setAutoCommit", args) =>
      autoCommit = args(0).asInstanceOf[java.lang.Boolean].booleanValue
      txEvents += s"setAutoCommit($autoCommit)"
      null
    case ("commit", _)   => txEvents += "commit"; null
    case ("rollback", _) => txEvents += "rollback"; null
  }
}
