package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.preprocess.Tokenizer

/** Golden cases replayed from `/root/reference/tests/test_tokenizer.py`. */
class TokenizerSpec extends AnyFunSuite {

  private def tokens(text: String): Seq[String] =
    Tokenizer(text).tokens.toSeq

  private def assertContains(text: String, expected: Seq[String]): Unit = {
    val ts = tokens(text)
    expected.foreach(w => assert(ts.contains(w), s"'$w' not in $ts"))
  }

  test("point between words is captured") {
    assertContains("The dog is hungry.The cat is evil.",
      Seq("dog", "hungry", "evil", "."))
  }
  test("hours are not splitted") {
    assertContains("It's 3:39 am, what do you want?", Seq("3:39"))
  }
  test("contraction It's is not splitted") {
    assertContains("It's 3:39 am, what do you want?", Seq("It's"))
  }
  test("question mark is splitted") {
    assertContains("It's 3:39 am, what do you want?", Seq("want", "?"))
  }
  test("web address is not splitted") {
    assertContains("Visit http://google.com", Seq("http://google.com"))
  }
  test("complex address is not splitted") {
    assertContains("Try with ssh://tom@hawk:2020 and tell me",
      Seq("ssh://tom@hawk:2020"))
  }
  test("contractions are not splitted") {
    assertContains("I'm ready for you all. Aren't you ready?. Don't you?",
      Seq("I'm", "Aren't", "Don't"))
  }
  test("hyphen dates are not splitted") {
    assertContains("Back to 10-23-1984 but not to 23/10/1984",
      Seq("10-23-1984"))
  }
  test("slashed dates are splitted") {
    assertContains("Back to 23/10/1984", Seq("10", "23", "1984"))
  }
  test("hyphened words are not splitted") {
    assertContains("User-friendliness is a must, use get_text.",
      Seq("User-friendliness"))
  }
  test("underscore words are not splitted") {
    assertContains("User-friendliness is a must, use get_text.",
      Seq("get_text"))
  }
  test("colon is splitted") {
    assertContains("read what I have to say:I like turtles.",
      Seq("say", ":", "I"))
  }
  test("possessive apostrophe is splitted") {
    assertContains("John's bar is cool.", Seq("John", "'s", "cool"))
  }
  test("emoticons detection") {
    assertContains("John's bar is cool, right :) XD?", Seq(":)", "XD", "?"))
  }
  test("parenthesis are splitted") {
    assertContains("The wolf (starved to death), killed a duck.",
      Seq("(", "starved", "death", ")", ","))
  }

  test("one offset per token; offsets exact") {
    val text = "John's bar is cool, right :) XD? " +
      "The wolf (starved to death), killed a duck."
    val tk = Tokenizer(text)
    assert(tk.tokens.length == tk.spans.length)
    tk.tokens.zip(tk.spans).foreach { case (t, off) =>
      assert(text.substring(off, off + t.length) == t)
    }
  }

  test("Punkt-divergence contract: rule splitter vs NLTK Punkt, boundary by boundary") {
    // The reference splits sentences with pre-trained NLTK Punkt
    // (reference tokenizer.py:77-82, Kiss & Strunk 2006 — an
    // UNSUPERVISED model that learns abbreviations, collocations and
    // frequent sentence starters from corpus statistics). This repo uses
    // the deterministic rule splitter above (fixed abbreviation list +
    // orthographic follow heuristic). On abbreviation-heavy natural
    // language the boundaries DIVERGE in two documented classes; this
    // test pins the repo's exact behavior per class so the divergence is
    // a tested contract, not an unknown. (Punkt cannot run in this
    // sandbox — its side is documented expectation, our side asserted.)
    def split(text: String): Seq[String] =
      Tokenizer.sentenceSpans(text).map { case (i, j) => text.substring(i, j) }

    // AGREEMENT: listed abbreviation mid-sentence — neither splits
    assert(split("He saw Dr. Smith yesterday. They spoke.") ==
      Seq("He saw Dr. Smith yesterday.", "They spoke."))
    // AGREEMENT: single-letter initials — neither splits
    assert(split("J. K. Rowling wrote it. B. was his codename.") ==
      Seq("J. K. Rowling wrote it.", "B. was his codename."))
    // AGREEMENT: ellipsis before a capitalized start — both split
    assert(split("Wait... Now go.") == Seq("Wait...", "Now go."))
    // AGREEMENT: lowercase continuation after an unknown dotted form —
    // neither splits (orthographic evidence beats lexicon both ways)
    assert(split("It leaves at 5 p.m. on Friday.") ==
      Seq("It leaves at 5 p.m. on Friday."))

    // DIVERGENCE CLASS 1 — repo UNDER-splits after a listed
    // abbreviation at a TRUE sentence end: the rule list is absolute
    // (abbrev => never a boundary), while Punkt weighs the capitalized
    // frequent sentence starter after it ("The", "Also") and usually
    // DOES split. Candidate windows and segments shift accordingly.
    assert(split("They visited Acme Inc. The firm was sold.") ==
      Seq("They visited Acme Inc. The firm was sold."))       // Punkt: 2
    assert(split("Bring pens, paper, etc. Also bring lunch.") ==
      Seq("Bring pens, paper, etc. Also bring lunch."))       // Punkt: 2

    // DIVERGENCE CLASS 2 — repo OVER-splits after an UNLISTED
    // abbreviation followed by a capitalized word: the fixed list has
    // no entry (e.g. "Blvd", "p.m"), so the orthographic heuristic
    // fires, while pre-trained Punkt has learned these as abbreviations
    // and typically keeps the sentence together.
    assert(split("He lives on Elm Blvd. Two blocks away.") ==
      Seq("He lives on Elm Blvd.", "Two blocks away."))       // Punkt: 1
    assert(split("The meeting is at 5 p.m. Next week we resume.") ==
      Seq("The meeting is at 5 p.m.", "Next week we resume.")) // Punkt: 1 (starter stats may flip it)

    // The consequence the pipeline inherits: a moved boundary moves the
    // segmenter's windows, hence candidate sets, on natural-language
    // corpora. The code-corpus north rule and the replayed reference
    // fixtures are unaffected (fixed "." + newline conventions).
  }

  test("sentences start at 0 and end at token count") {
    val tk = Tokenizer("The wolf killed a duck. What a pitty")
    assert(tk.sentences.head == 0)
    assert(tk.sentences.last == tk.tokens.length)
    assert(tk.sentences.length == 3) // two sentences
  }

  test("empty text gives sentences [0]") {
    val tk = Tokenizer("")
    assert(tk.sentences.toSeq == Seq(0))
    assert(tk.tokens.isEmpty)
  }

  test("sentence boundaries strictly increasing") {
    val tk = Tokenizer(
      "Function parse_header_1 calls function emit_event_2 .\n" +
        "Function emit_event_2 is defined in module auth_core_0 .\n")
    assert(tk.sentences.toSeq == tk.sentences.toSeq.distinct.sorted)
    assert(tk.sentences.length == 3)
  }

  test("fast path == full-regex oracle on corpus + adversarial inputs") {
    val adversarial = Seq(
      "plain words here", "snake_case_name and CamelCase mixed",
      "a.b@host.com mailto:x@y.z http://foo.bar/baz?q=1",
      "meet at 12:30 or 2:5:59 on 12/25/2020 or 1-2-99",
      "don't can't've o'clock John's y'all'd've word's",
      "compound-word multi-part-token a_b-c mixed_under-dash",
      "AT&T r&d a&b&c", "x( 8) :-D xD XP =) ;o| 8-D",
      "3.14 1,000 50% #tag [a](b) {c} <d> e=f g+h i*j",
      "www.example.org example.co.uk:8080 git://host/path",
      "trailing. dots.. ellipsis... mid.dle",
      "quote''s ``quoted'' \"double\" 'single'",
      "tabs\tand  double  spaces\nnewlines",
      "unicode caf\u00e9 na\u00efve \u00fcber zh\u00f4ng",
      "e.g. i.e. Mr. Smith vs. Dr. No",
      "!bang !!double ?q ?? end!", "_lead _under_ trail_",
      "123abc abc123 1a2b3c", "a", "Z", "9", "_", "", " ", "  ",
      "edge'", "'edge", "edge-", "-edge", "edge&", "&edge",
      "edge.", ".edge", "edge:", ":edge", "edge@", "@edge",
      // U+001C..U+001F: isWhitespace=true but Unicode White_Space=No —
      // the regex's \S+ treats them as token chars; the fast path must
      // not skip them as whitespace
      "a\u001Cb", "a\u001Db", "a\u001Eb", "a\u001Fb",
      "\u001Cx", "x\u001C", "a \u001C b", "\u001C\u001D\u001E\u001F",
      "word\u001Cword\u001Dword", "1\u001E2", "a\u000Bb", "a\u0085b")
    val corpus = (0 until 100).map(i =>
      graft.corpus.CorpusGen.genOne(0.001, 42L, i.toLong).content)
    (adversarial ++ corpus).foreach { text =>
      // compare at the sentence level (tokenizeSentence is where the
      // fast path lives)
      Tokenizer.sentenceSpans(text).foreach { case (i, j) =>
        val sent = text.substring(i, j)
        val fast = Tokenizer.tokenizeSentence(sent)
        val oracle = Tokenizer.tokenizeSentenceRegexOnly(sent)
        assert(fast == oracle,
          s"fast-path divergence on sentence: [$sent]\n fast=$fast\n orac=$oracle")
      }
    }
  }
}
