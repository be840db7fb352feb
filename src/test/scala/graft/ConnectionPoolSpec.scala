package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager}
import java.util.Properties
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ConnectionPool

/** Pool semantics against a counting fake JDBC driver: reuse across
  * borrows, close-on-error (never re-pool a suspect conn), stale-idle
  * re-dial, and the idle cap. */
class ConnectionPoolSpec extends AnyFunSuite {

  private object FakeDriver extends Driver {
    val dialed = new AtomicInteger(0)
    val closed = new AtomicInteger(0)
    @volatile var validReturns = true

    private def newConn(): Connection = {
      val open = new java.util.concurrent.atomic.AtomicBoolean(true)
      Proxy.newProxyInstance(getClass.getClassLoader,
        Array(classOf[Connection]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
            m.getName match {
              case "close" =>
                if (open.getAndSet(false)) closed.incrementAndGet(); null
              case "isClosed" => java.lang.Boolean.valueOf(!open.get())
              case "isValid" =>
                java.lang.Boolean.valueOf(open.get() && validReturns)
              case "toString" => "fake-conn"
              case "hashCode" => Integer.valueOf(System.identityHashCode(p))
              case "equals" => java.lang.Boolean.valueOf(p eq args(0))
              case _ => null
            }
        }).asInstanceOf[Connection]
    }

    override def connect(url: String, info: Properties): Connection =
      if (acceptsURL(url)) { dialed.incrementAndGet(); newConn() } else null
    override def acceptsURL(url: String): Boolean =
      url.startsWith("jdbc:graftfake:")
    override def getPropertyInfo(u: String, p: Properties) = Array.empty
    override def getMajorVersion = 1
    override def getMinorVersion = 0
    override def jdbcCompliant() = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException
  }
  DriverManager.registerDriver(FakeDriver)

  private val url = "jdbc:graftfake:pool"
  private val props = new Properties()

  private def reset(): Unit = {
    ConnectionPool.drain()
    FakeDriver.dialed.set(0)
    FakeDriver.closed.set(0)
    FakeDriver.validReturns = true
  }

  test("sequential borrows reuse one physical connection") {
    reset()
    (1 to 5).foreach { _ =>
      ConnectionPool.withConnection(url, props)(c => assert(c.isValid(1)))
    }
    assert(FakeDriver.dialed.get() === 1)
    assert(FakeDriver.closed.get() === 0)
  }

  test("a throwing work function closes the connection instead of re-pooling") {
    reset()
    intercept[RuntimeException] {
      ConnectionPool.withConnection(url, props)(_ => throw new RuntimeException("boom"))
    }
    assert(FakeDriver.closed.get() === 1)
    // next borrow must re-dial, not hand back the poisoned conn
    ConnectionPool.withConnection(url, props)(_ => ())
    assert(FakeDriver.dialed.get() === 2)
  }

  test("stale idle connections are dropped and re-dialed on borrow") {
    reset()
    ConnectionPool.withConnection(url, props)(_ => ())
    assert(FakeDriver.dialed.get() === 1)
    FakeDriver.validReturns = false // the pooled conn now fails isValid
    ConnectionPool.withConnection(url, props)(_ => ())
    assert(FakeDriver.dialed.get() === 2, "stale conn must be replaced")
    assert(FakeDriver.closed.get() === 1, "stale conn must be closed")
  }

  test("open cap: borrows beyond maxOpenPerTarget block instead of dialing") {
    reset()
    val prevOpen = ConnectionPool.maxOpenPerTarget
    ConnectionPool.maxOpenPerTarget = 2
    try {
      val entered = new java.util.concurrent.CountDownLatch(2)
      val release = new java.util.concurrent.CountDownLatch(1)
      val done = new java.util.concurrent.CountDownLatch(3)
      (1 to 2).foreach { _ =>
        val t = new Thread(() => {
          ConnectionPool.withConnection(url, props) { _ =>
            entered.countDown(); release.await()
          }
          done.countDown()
        })
        t.setDaemon(true); t.start()
      }
      entered.await()
      assert(FakeDriver.dialed.get() === 2)
      val third = new Thread(() => {
        ConnectionPool.withConnection(url, props)(_ => ()); done.countDown()
      })
      third.setDaemon(true); third.start()
      Thread.sleep(200)
      assert(FakeDriver.dialed.get() === 2,
        "third borrow must block at the open cap, not dial past it")
      release.countDown()
      done.await()
      assert(FakeDriver.dialed.get() === 2,
        "unblocked borrow must reuse a returned conn, not dial")
    } finally {
      ConnectionPool.maxOpenPerTarget = prevOpen
      ConnectionPool.drain()
    }
  }

  test("idle cap: surplus connections close on return") {
    reset()
    // dial cap+1 conns by nesting borrows so none can be reused
    def nest(depth: Int): Unit =
      if (depth > 0)
        ConnectionPool.withConnection(url, props)(_ => nest(depth - 1))
    nest(ConnectionPool.maxIdlePerTarget + 1)
    assert(FakeDriver.dialed.get() === ConnectionPool.maxIdlePerTarget + 1)
    assert(FakeDriver.closed.get() === 1, "one conn over the cap must close")
  }
}
