package graft

import java.sql.{Connection, Driver, DriverManager, SQLException, SQLFeatureNotSupportedException}
import java.util.Properties
import scala.collection.concurrent.TrieMap

/** Minimal in-process JDBC endpoint for the MySQL upsert dialect —
  * test-only. The zero-egress sandbox has no MySQL (and no H2/MySQL-
  * mode jar), so the `INSERT ... ON DUPLICATE KEY UPDATE` branch of
  * [[graft.streaming.JdbcUpsertSink]] could only ever be
  * string-inspected. This endpoint speaks EXACTLY the JDBC surface
  * that branch drives — `getConnection`, `createStatement().execute`
  * (the generated `CREATE TABLE ... PRIMARY KEY`), `prepareStatement`
  * with positional `set*`/`addBatch`/`executeBatch`, autocommit/
  * commit/close — against a shared in-JVM PK-map store with real
  * ON-DUPLICATE semantics (insert when the key is absent, overwrite
  * the non-key columns from VALUES() when present, duplicate-key
  * SQLState 23000 if the clause is absent, 42S01 on re-CREATE).
  *
  * The sink's executor-side `foreachPartition` path then EXECUTES its
  * MySQL statements: placeholder order, parameter binding, batching,
  * and upsert semantics are all exercised, not just generated.
  * Interfaces are reflection proxies — only the methods the sink
  * calls are implemented; anything else throws, so silent partial
  * emulation cannot hide a protocol change.
  */
object MysqlMock {

  val Prefix = "jdbc:graftmysql:"

  final case class Table(cols: Seq[String], keyCols: Seq[String],
      rows: TrieMap[Seq[Any], Seq[Any]])

  private val dbs = new TrieMap[String, TrieMap[String, Table]]()

  def db(name: String): TrieMap[String, Table] =
    dbs.getOrElseUpdate(name, new TrieMap)

  def clear(name: String): Unit = { dbs.remove(name); () }

  /** Force object init (registers the driver). */
  def ensureRegistered(): Unit = ()

  // ---------------------------------------------------------- plumbing

  private def proxy[T](clazz: Class[T])(
      handler: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    java.lang.reflect.Proxy.newProxyInstance(clazz.getClassLoader, Array(clazz),
      (p, method, args) => {
        val a = if (args == null) Array.empty[AnyRef] else args
        (method.getName, a) match {
          case ("hashCode", _) => Int.box(System.identityHashCode(p))
          case ("equals", Array(o)) => Boolean.box(p eq o)
          case ("toString", _) => s"MysqlMock.${clazz.getSimpleName}"
          case ("close", _) | ("setAutoCommit", _) | ("commit", _) |
               ("rollback", _) | ("clearBatch", _) | ("clearParameters", _) => null
          case ("isClosed", _) => Boolean.box(false)
          case key => handler.applyOrElse(key, (k: (String, Array[AnyRef])) =>
            throw new SQLFeatureNotSupportedException(
              s"MysqlMock does not emulate ${clazz.getSimpleName}.${k._1}"))
        }
      }).asInstanceOf[T]

  private val CreateRe =
    """(?is)CREATE TABLE (\w+) \((.*), PRIMARY KEY \(([^)]*)\)\)""".r
  private val UpsertRe =
    """(?is)INSERT INTO (\w+) \(([^)]*)\) VALUES \(([^)]*)\)(?: ON DUPLICATE KEY UPDATE (.*))?""".r

  private def split(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def connection(store: TrieMap[String, Table]): Connection =
    proxy(classOf[Connection]) {
      case ("createStatement", _) => proxy(classOf[java.sql.Statement]) {
        case ("execute", Array(sqlAny)) =>
          sqlAny.asInstanceOf[String] match {
            case CreateRe(name, colDefs, pk) =>
              val cols = split(colDefs).map(_.split("\\s+")(0))
              if (store.putIfAbsent(name,
                  Table(cols, split(pk), new TrieMap)).isDefined)
                throw new SQLException(s"table $name exists", "42S01")
              Boolean.box(false)
            case other => throw new SQLException(s"unsupported DDL: $other")
          }
      }
      case ("prepareStatement", Array(sqlAny)) =>
        sqlAny.asInstanceOf[String] match {
          case UpsertRe(name, colList, placeholders, updates) =>
            val table = store.getOrElse(name,
              throw new SQLException(s"no table $name", "42S02"))
            val cols = split(colList)
            require(split(placeholders).forall(_ == "?"), "positional only")
            // the generated clause is always `c = VALUES(c)` per
            // non-key column; verify rather than interpret
            Option(updates).foreach { u =>
              val expect = cols.filterNot(table.keyCols.contains)
                .map(c => s"$c = VALUES($c)").toSet
              require(split(u).toSet == expect,
                s"unexpected update clause: $u")
            }
            val keyIdx = table.keyCols.map(cols.indexOf)
            require(keyIdx.forall(_ >= 0), "key column missing from insert")
            val params = new TrieMap[Int, Any]()
            val batch = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
            proxy(classOf[java.sql.PreparedStatement]) {
              case ("setNull", Array(i, _)) =>
                params.put(i.asInstanceOf[Integer].intValue, null); null
              case (m, Array(i, v)) if m.startsWith("set") =>
                params.put(i.asInstanceOf[Integer].intValue, v); null
              case ("addBatch", _) =>
                batch += (1 to cols.length).map(params.getOrElse(_,
                  throw new SQLException("unbound parameter"))); null
              case ("executeBatch", _) =>
                val counts = batch.map { row =>
                  val key = keyIdx.map(row(_))
                  val existed = table.rows.put(key, row).isDefined
                  if (existed && updates == null)
                    throw new SQLException("duplicate key", "23000")
                  if (existed) 2 else 1 // MySQL's reported counts
                }.toArray
                batch.clear()
                counts
            }
          case other => throw new SQLException(s"unsupported DML: $other")
        }
    }

  private object MockDriver extends Driver {
    def connect(url: String, info: Properties): Connection =
      if (!acceptsURL(url)) null
      else connection(db(url.stripPrefix(Prefix)))
    def acceptsURL(url: String): Boolean =
      url != null && url.startsWith(Prefix)
    def getPropertyInfo(u: String, p: Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    def getMajorVersion = 1
    def getMinorVersion = 0
    def jdbcCompliant() = false
    def getParentLogger: java.util.logging.Logger =
      throw new SQLFeatureNotSupportedException
  }

  DriverManager.registerDriver(MockDriver)
}
