package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** CLI parsing contract: same flag shapes as the reference's Go flag
  * package, loud failures on typos. */
class ParseArgsSpec extends AnyFunSuite {

  private def parse(args: String*) = MaillogDaemon.parseArgs(args.toArray)

  test("value flags and bare -debug") {
    val c = parse("-maillog", "/logs", "-dbhost", "10.0.0.1", "-dbport", "3307",
      "-debug", "-year", "2024", "-state-ttl-ms", "60000",
      "-max-files-per-trigger", "10", "-logfile", "/tmp/x.log")
    assert(c.maillog === "/logs")
    assert(c.dbhost === "10.0.0.1")
    assert(c.dbport === 3307)
    assert(c.debug)
    assert(c.year === 2024)
    assert(c.stateTtlMs === 60000L)
    assert(c.maxFilesPerTrigger === 10)
    assert(c.logfile === "/tmp/x.log")
  }

  test("db url/dialect overrides") {
    val c = parse("-db-url", "jdbc:derby:/tmp/db", "-db-dialect", "generic",
      "-dbuser", "APP")
    assert(c.dbUrl === "jdbc:derby:/tmp/db")
    assert(c.dbDialect === "generic")
    assert(c.dbuser === "APP")
  }

  test("-debug with explicit boolean (Go style)") {
    assert(parse("-debug", "true", "-maillog", "/x").debug)
    assert(!parse("-debug", "false").debug)
  }

  test("unknown flag fails loudly") {
    val e = intercept[IllegalArgumentException] { parse("-mailog", "/x") }
    assert(e.getMessage.contains("-mailog"))
    // trailing typo must be diagnosed as unknown, not missing-value
    val t = intercept[IllegalArgumentException] { parse("-mailog") }
    assert(t.getMessage.contains("unknown flag"))
  }

  test("value flag missing its value fails loudly") {
    val e = intercept[IllegalArgumentException] { parse("-maillog") }
    assert(e.getMessage.contains("requires a value"))
  }

  test("defaults mirror the reference") {
    val c = parse("-debug")
    assert(c.maillog === "/var/log/maillog")
    assert(c.dbport === 3306)
    assert(c.year === 0) // wall-clock at parse time
  }
}
