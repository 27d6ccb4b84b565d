package graft.preprocess

/** Deterministic rule-based POS tagger.
  *
  * The reference shells out to a Stanford tagger
  * (`/root/reference/iepy/preprocess/tagger.py:17-59`); its downstream
  * consumers (features F2/F15/F16, rule `Pos(...)` predicates) only need
  * CONSISTENT Penn-style tags, not linguistic accuracy — the reference
  * asserts exactly one tag per token (`tagger.py:49-52`), which we keep.
  * Brackets are emitted Penn-style `-LRB-`/`-RRB-` as the rule engine
  * translates them back (`/root/reference/iepy/data/models.py:446-452`).
  */
object PosTagger {

  private val determiners = Set("the", "a", "an", "this", "that", "these",
    "those", "each", "every", "some", "any", "no")
  private val prepositions = Set("in", "on", "at", "of", "by", "for",
    "from", "to", "with", "into", "over", "under", "between", "during",
    "through", "since", "until", "within")
  private val conjunctions = Set("and", "or", "but", "nor", "so", "yet")
  private val pronouns = Set("he", "she", "it", "they", "we", "you", "i",
    "him", "her", "them", "us", "me", "his", "their", "its", "our", "your",
    "my")
  private val modals = Set("can", "could", "may", "might", "must", "shall",
    "should", "will", "would")
  private val beVerbs = Map("is" -> "VBZ", "are" -> "VBP", "was" -> "VBD",
    "were" -> "VBD", "be" -> "VB", "been" -> "VBN", "being" -> "VBG",
    "am" -> "VBP", "has" -> "VBZ", "have" -> "VBP", "had" -> "VBD",
    "does" -> "VBZ", "do" -> "VBP", "did" -> "VBD")
  // small closed list of verbs our synthetic corpus + rules rely on
  private val knownVerbBases = Set("call", "invoke", "use", "import",
    "define", "extend", "implement", "return", "depend", "declare",
    "expose", "export", "test", "cover", "contain", "provide", "wrap",
    "override", "raise", "emit", "read", "write", "parse", "build",
    "create", "delete", "update", "register", "handle", "score", "kill",
    "bear")

  private val numRe = "^[0-9]+([\\.,][0-9]+)*$".r
  private val punct = Set(".", ",", ";", ":", "?", "!", "-", "\"", "'",
    "`", "''", "``", "...", "/", "~")

  def tagToken(tok: String): String = {
    val lower = tok.toLowerCase
    tok match {
      case "(" | "[" | "{" => "-LRB-"
      case ")" | "]" | "}" => "-RRB-"
      case t if punct.contains(t) => t
      case _ if numRe.findFirstIn(tok).isDefined => "CD"
      case _ if determiners.contains(lower) => "DT"
      case _ if prepositions.contains(lower) => "IN"
      case _ if conjunctions.contains(lower) => "CC"
      case _ if pronouns.contains(lower) => "PRP"
      case _ if modals.contains(lower) => "MD"
      case _ if beVerbs.contains(lower) => beVerbs(lower)
      case _ if lower.endsWith("ed") &&
        (knownVerbBases.contains(lower.dropRight(1)) ||
          knownVerbBases.contains(lower.dropRight(2))) => "VBD"
      case _ if lower.endsWith("ing") &&
        (knownVerbBases.contains(lower.dropRight(3)) ||
          knownVerbBases.contains(lower.dropRight(3) + "e")) => "VBG"
      case _ if lower.endsWith("s") &&
        (knownVerbBases.contains(lower.dropRight(1)) ||
          knownVerbBases.contains(lower.dropRight(2))) => "VBZ"
      case _ if knownVerbBases.contains(lower) => "VB"
      case _ if tok.nonEmpty && tok.head.isUpper => "NNP"
      case _ if lower.endsWith("s") => "NNS"
      case _ => "NN"
    }
  }

  def tag(tokens: Array[String]): Array[String] = tokens.map(tagToken)

  /** Lemma = lowercased token (reference markup-DSL convention,
    * `/root/reference/tests/test_features.py:26-38`; code corpus needs no
    * richer lemmatizer). */
  def lemmas(tokens: Array[String]): Array[String] =
    tokens.map(_.toLowerCase)
}
