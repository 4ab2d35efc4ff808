package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.crawl.{Robots, RobotsRule}

/** robots.txt parsing (RFC 9309 subset) — pure, no Spark session. */
class RobotsSpec extends AnyFunSuite {

  private def parse(body: String, ua: String = "graftbot") =
    Robots.parseRobotsTxt("h.example", body, ua)

  test("UA-specific group beats the * group (longest agent match)") {
    val body =
      """User-agent: graftbot
        |Disallow: /private
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    val r = parse(body)
    assert(r.allowAll && r.disallowPrefixes == Seq("/private"))
    // an unrelated UA falls to the * group: full deny
    val other = parse(body, "otherbot")
    assert(!other.allowAll)
  }

  test("Crawl-delay: parsed per group, applicable group's delay surfaces") {
    val body =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    assert(parse(body).crawlDelaySec == Some(3)) // ceil(2.5)
    assert(parse(body, "otherbot").crawlDelaySec == Some(10))
    assert(parse("User-agent: *\nDisallow: /d").crawlDelaySec.isEmpty)
    // garbage / non-positive values ignored
    assert(parse("User-agent: *\nCrawl-delay: nope").crawlDelaySec.isEmpty)
    assert(parse("User-agent: *\nCrawl-delay: -4").crawlDelaySec.isEmpty)
    // a full-deny group still carries its delay
    assert(parse("User-agent: *\nCrawl-delay: 7\nDisallow: /")
      .crawlDelaySec == Some(7))
  }

  test("Disallow: / denies everything; empty Disallow allows everything") {
    assert(!parse("User-agent: *\nDisallow: /").allowAll)
    val open = parse("User-agent: *\nDisallow:")
    assert(open.allowAll && open.disallowPrefixes.isEmpty)
  }

  test("missing/blank file allows all; unknown directives + comments ignored") {
    assert(parse("").allowAll)
    assert(parse(null).allowAll)
    val r = parse(
      """# welcome crawlers
        |User-agent: *   # all agents
        |Foo-bar: baz
        |Disallow: /tmp  # scratch space
        |""".stripMargin)
    assert(r.allowAll && r.disallowPrefixes == Seq("/tmp"))
  }

  test("grouped agents: several User-agent lines share the rules below them") {
    val r = parse(
      """User-agent: alphabot
        |User-agent: graftbot
        |Disallow: /x
        |
        |User-agent: *
        |Disallow: /y
        |""".stripMargin)
    assert(r.disallowPrefixes == Seq("/x"))
  }

  test("allows(): deny-by-default for unknown hosts, prefix semantics") {
    assert(!Robots.allows(None, "/anything"))
    val rule = Some(RobotsRule("h", allowAll = true, Seq("/private")))
    assert(Robots.allows(rule, "/jportal/docs"))
    assert(!Robots.allows(rule, "/private/docs"))
  }

  test("synthetic fixtures round-trip through the parser to the expected rules") {
    val rules = Robots.syntheticRules(100, 42L)
    assert(rules.size == 100)
    val denied = rules.values.count(!_.allowAll)
    assert(denied > 0 && denied < 20, s"~1/23 hosts denied, got $denied")
    rules.values.filter(_.allowAll).foreach { r =>
      assert(r.disallowPrefixes == Seq("/private"))
    }
  }
}
