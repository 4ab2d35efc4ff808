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

  test("adversarial property: noisy pathological robots bodies round-trip to their structural semantics") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // structural model: a robots file IS a list of (agents, rule-lines)
    // groups; render it to hostile text (case noise, comments, unknown
    // directives, whitespace), parse, and compare against the semantics
    // computed directly from the structure — the renderer noise and the
    // pathological shapes (conflicting/duplicate groups, zero/negative/
    // huge/NaN Crawl-delay, unicode and quoted paths, full-deny inside a
    // losing group) are the point.
    case class G(agents: List[String], disallows: List[String],
        delayRaws: List[String])
    val agentPool = Gen.oneOf("*", "graft", "graftbot", "g", "zz", "граф")
    val pathPool = Gen.oneOf("/", "/private", "/прив ат", "/a%20b", "/🜲x",
      "/admin", "/a/b/c")
    val delayPool = Gen.oneOf("0", "-3", "7", "3.2", "10000000000", "abc",
      "1e3", "NaN")
    val groupGen = for {
      as <- Gen.nonEmptyListOf(agentPool).map(_.take(3))
      ds <- Gen.listOf(pathPool).map(_.take(4))
      dl <- Gen.listOf(delayPool).map(_.take(2))
    } yield G(as, ds, dl)
    val fileGen = Gen.listOf(groupGen).map(_.take(5))
    def caseNoise(s: String, r: scala.util.Random): String =
      s.map(c => if (r.nextBoolean()) c.toUpper else c.toLower)
    // expected semantics computed from the STRUCTURE (the documented
    // subset: longest-prefix agent match, * = specificity 0, first group
    // wins ties, last Crawl-delay line wins incl. unparsable resets,
    // Disallow: / = full deny)
    def expectedRule(host: String, gs: List[G], ua: String): RobotsRule = {
      val applicable = gs.flatMap { g =>
        g.agents.collect {
          case "*" => (0, g)
          case a if ua.startsWith(a) => (a.length, g)
        }
      }
      applicable.sortBy(-_._1).headOption match {
        case None => RobotsRule(host, allowAll = true, Seq.empty)
        case Some((_, g)) =>
          val delay = g.delayRaws.foldLeft(Option.empty[Int]) { (_, raw) =>
            scala.util.Try(raw.toDouble).toOption.filter(_ > 0)
              .map(d => math.max(1, math.ceil(d).toInt))
          }
          if (g.disallows.contains("/"))
            RobotsRule(host, allowAll = false, Seq.empty, delay)
          else RobotsRule(host, allowAll = true, g.disallows.distinct, delay)
      }
    }
    (1 to 200).foreach { trial =>
      val gs0 = fileGen.apply(Gen.Parameters.default, Seed(trial.toLong))
        .getOrElse(Nil)
      // parser folds duplicate Disallow values per group? No — it keeps
      // duplicates; normalize the model by deduping BOTH sides below.
      val gs = gs0
      val r = new scala.util.Random(trial)
      val text = gs.map { g =>
        val agentLines = g.agents.map(a => s"  ${caseNoise("User-agent", r)}: $a")
        val ruleLines =
          g.disallows.map(p => s"${caseNoise("Disallow", r)}: $p  ") ++
          g.delayRaws.map(d => s"${caseNoise("Crawl-delay", r)}: $d") ++
          Seq(s"${caseNoise("Allow", r)}: /always") // ensures ≥1 rule line
        val noise = Seq("# comment line", "Frobnicate: yes", "")
        (agentLines ++ ruleLines ++ noise).mkString("\n")
      }.mkString("\n")
      val got = parse(text)
      val want = expectedRule("h.example", gs, "graftbot")
      assert(got.allowAll == want.allowAll &&
        got.disallowPrefixes.distinct == want.disallowPrefixes &&
        got.crawlDelaySec == want.crawlDelaySec,
        s"trial $trial:\n got=$got\nwant=$want\nbody:\n$text")
      // deny-by-default holds regardless of rule pathology
      assert(!Robots.allows(None, "/anything"))
      // allows() semantics: full deny blocks every path incl. unicode;
      // prefix rules block exactly their subtrees
      val paths = Seq("/", "/private/x", "/прив атY", "/🜲x/z", "/ok")
      paths.foreach { p =>
        val a = Robots.allows(Some(got), p)
        val expect = want.allowAll && !want.disallowPrefixes.exists(p.startsWith)
        assert(a == expect, s"trial $trial path $p: got $a want $expect")
      }
    }
  }
}
