package graft.crz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dictionary mining (05_build_special_dictionary.py, SURVEY.md §2.4
  * A4 / §2.7 F21-F22): Slovak-alphabet tokenization, spell-membership
  * against broadcast dictionaries, out-of-vocabulary wordcount with
  * HAVING count > 5.
  *
  * Spell semantics note (SURVEY.md §7.4.1): real hunspell applies affix
  * morphology; the engine uses wordlist-set membership (dic wordlist ∪
  * special dict ∪ keywords), which is what the reference itself does
  * for the special dict (09_clean_tables.py:85,134). The delta is
  * documented, deliberate, and pinned by fixture tests.
  */
object Dictionary {

  /** Load a hunspell-style `.dic` wordlist: first line is the word
    * count header (dropped — it is the only all-digit line a wordlist
    * legitimately contains), one word per line after. Entries may
    * carry affix flags (`zmluva/8,13`): the flag string is split off
    * into a `flags` column ([[expandWithAffixes]] consumes it; every
    * other consumer selects `word` and is unaffected). One loader for
    * Pipeline.run and every spec — the header rule lives here only. */
  def loadDic(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    s.read.text(path)
      .where(!col("value").rlike("^[0-9]+$"))
      // the entry is the line's first whitespace-token: hunspell .dic
      // lines may carry tab/space-separated morphological fields
      // ('slovo/12\tpo:noun') which are not part of the word or flags
      .select(regexp_extract(col("value"), "^\\S+", 0).as("entry"))
      .where(col("entry") =!= "")
      .select(substring_index(col("entry"), "/", 1).as("word"),
        when(col("entry").contains("/"),
          substring_index(col("entry"), "/", -1)).as("flags"))

  /** F21 — Slovak-alphabet tokenizer (05_build:22-38): split on any
    * run of characters outside the Slovak alphabet. */
  val slovakTokenSplit = "[^aáäbcčdďeéfghiíjklĺľmnňoóôpqrŕsštťuúvwxyýzž]+"

  def tokenize(corpus: DataFrame): DataFrame =
    corpus
      .select(col("contract_id"),
        explode(split(lower(col("text")), slovakTokenSplit)).as("word"))
      .where(col("word") =!= "")

  /** A4 — OOV mining: words failing dictionary membership, counted,
    * kept above the reference's threshold (count > 5, 05_build:139),
    * sorted desc (O2). `dictionary`: DataFrame[word]. */
  def mineSpecialWords(corpus: DataFrame, dictionary: DataFrame,
      minCount: Long = 5L): DataFrame =
    tokenize(corpus)
      .join(broadcast(dictionary.select(lower(col("word")).as("word"))
        .distinct()), Seq("word"), "left_anti")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .where(col("n") > minCount)
      .orderBy(col("n").desc, col("word"))

  /** Numeric/currency tokens hunspell's spell() accepts without a
    * dictionary hit (09_clean_tables.py:91-93 accepts numbers): prices
    * like '100,00', '100 €', '15%'. Without this rule every price
    * column scores wrong_ratio 1.0 and is dropped as a dummy column —
    * the very columns the price-table gate exists to keep. At least
    * one digit is required so punctuation-only tokens ('-', '€€€',
    * '...') stay misspelled — hunspell accepts numbers, not bare
    * punctuation, and a column of dash placeholders IS a dummy column.
    * The class includes NBSP (U+00A0) and narrow NBSP (U+202F):
    * Slovak number formatting uses them as thousands separators
    * ('1 000,00'), and the \\s+ cell tokenizer upstream does not
    * split on them — without these two characters every NBSP-formatted
    * price column would score wrong_ratio 1.0 and be dropped as dummy,
    * the exact failure this rule exists to prevent. */
  val numericTokenPattern = "^[0-9., \u00A0\u202F€%-]+$"
  private val hasDigit = "[0-9]"

  /** Parse the REP table of a hunspell `.aff` file (sk_SK.aff's 52
    * rules) into (rep_from, rep_to) rows. The `REP <count>` header is
    * excluded by shape: two tokens, or an all-digit count followed by
    * a comment (`REP 52 # substitutions`) — the same real-world
    * trailing-comment tolerance [[loadAffixRules]] applies to its
    * block headers. */
  def loadRepRules(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    s.read.text(path)
      .where(col("value").rlike("^REP\\s+\\S+\\s+\\S+"))
      .select(split(col("value"), "\\s+").as("p"))
      .where(!(element_at(col("p"), 2).rlike("^[0-9]+$") &&
        element_at(col("p"), 3).rlike("^#")))
      .select(element_at(col("p"), 2).as("rep_from"),
        element_at(col("p"), 3).as("rep_to"))

  /** Hunspell-affix approximation (F22 delta-shrinker, SURVEY §7.4.1):
    * expand the wordlist with every single-rule REP application
    * before it is broadcast, so diacritic/inflection variants the
    * `.aff` REP table anticipates ('dielo' + `REP o a` → 'diela')
    * pass membership. This narrows, not closes, the gap to full affix
    * morphology: REP is hunspell's substitution table, applied here to
    * ALL occurrences per rule (one rule per variant, like hunspell's
    * one-REP suggestion step). Hunspell's REP anchors are honored:
    * `^from` replaces a prefix, `from$` a suffix, `^from$` the whole
    * word — anchored entries were previously inert because the anchor
    * characters were searched as literals. Dictionary-side-only work:
    * wordlist × rules happens once on the dim side, before broadcast —
    * the corpus never pays for it. */
  def expandWithRep(dictionary: DataFrame, repRules: DataFrame): DataFrame = {
    val base = dictionary.select(lower(col("word")).as("word"))
    val pre = col("rep_from").startsWith("^")
    val suf = col("rep_from").endsWith("$")
    val expanded = base
      .crossJoin(broadcast(repRules))
      .withColumn("core", regexp_replace(col("rep_from"), "^\\^|\\$$", ""))
      .where(
        when(pre && suf, col("word") === col("core"))
          .when(pre, col("word").startsWith(col("core")))
          .when(suf, col("word").endsWith(col("core")))
          .otherwise(col("word").contains(col("core"))))
      .select(
        when(pre && suf, col("rep_to"))
          .when(pre, concat(col("rep_to"),
            expr("substring(word, length(core) + 1)")))
          .when(suf, concat(
            expr("substring(word, 1, length(word) - length(core))"),
            col("rep_to")))
          .otherwise(replace(col("word"), col("core"), col("rep_to")))
          .as("word"))
    base.union(expanded).distinct()
  }

  /** Parse the SFX/PFX blocks of a hunspell `.aff` file into
    * (kind, flag, strip, append, cond, cross, cont) rows. A rule line
    * has five fields — `SFX 8 a y a` = flag 8, strip `a`, append `y`,
    * condition `a` (a regex fragment matched at the word END for SFX,
    * START for PFX; `.` = always) — while the block header
    * (`SFX 8 Y 1`) carries the cross-product flag (`Y` = this block's
    * rules may combine with a cross-product PFX/SFX partner, see
    * [[expandWithAffixes]]) and the rule count. `0` means an empty
    * strip/append; continuation classes after `/` in the append field
    * (`SFX 1 0 able/2 .` — the derived form then carries flag 2 and
    * may take a second affix) land in `cont`, consumed by
    * [[expandWithAffixes]]'s two-step chain. sk_SK.aff (reference
    * Dicts/sk_SK.aff) carries 6 586 SFX + 1 556 PFX rules in this
    * shape, numeric flags (`FLAG num`), and zero continuation
    * classes (grep-verified — the chain is vacuous on the
    * reference's own dictionaries). */
  def loadAffixRules(s: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val toks = s.read.text(path)
      .where(col("value").rlike("^(SFX|PFX)\\s"))
      .select(split(col("value"), "\\s+").as("p"))
    // a header is `KIND flag Y|N <count>` — possibly with a trailing
    // comment (`SFX 10 Y 1 # comparative`), which real-world .aff
    // files carry, so the test is shape-based (Y/N then digits, then
    // nothing or a comment), not a bare token count. Positions 3-5 are
    // probed with try_element_at: under ANSI a malformed line starting
    // with SFX/PFX but carrying fewer tokens must read null (failing
    // the shape test) rather than throw INVALID_ARRAY_INDEX and kill
    // the whole load
    val isHeader = try_element_at(col("p"), lit(3)).isin("Y", "N") &&
      try_element_at(col("p"), lit(4)).rlike("^[0-9]+$") &&
      (size(col("p")) === 4 ||
        try_element_at(col("p"), lit(5)).rlike("^[#/]"))
    val headers = toks
      .where(isHeader)
      .select(
        element_at(col("p"), 1).as("kind"),
        element_at(col("p"), 2).as("flag"),
        (element_at(col("p"), 3) === "Y").as("cross"))
    toks
      .where(size(col("p")) >= 5 && !isHeader)
      .select(
        element_at(col("p"), 1).as("kind"),
        element_at(col("p"), 2).as("flag"),
        when(element_at(col("p"), 3) === "0", "")
          .otherwise(element_at(col("p"), 3)).as("strip"),
        // the zero-append test must run on the PRE-slash portion:
        // hunspell's zero-affix-with-continuation form (`SFX 1 0 0/2
        // .`) would otherwise append a literal "0"
        when(substring_index(element_at(col("p"), 4), "/", 1) === "0", "")
          .otherwise(substring_index(element_at(col("p"), 4), "/", 1))
          .as("append"),
        when(element_at(col("p"), 4).contains("/"),
          substring_index(element_at(col("p"), 4), "/", -1)).as("cont"),
        element_at(col("p"), 5).as("cond"))
      .join(headers, Seq("kind", "flag"), "left")
      .withColumn("cross", coalesce(col("cross"), lit(false)))
  }

  /** The `.aff` `FLAG` directive's value — `num`, `long`, `UTF-8` —
    * or "char" (the classic one-character packing) when the directive
    * is absent. Read from the directive, never guessed from flag
    * shapes: a char-flag entry `word/12` means flags '1' and '2',
    * which a digits-based heuristic would misread as one flag "12".
    *
    * Hunspell allows at most ONE FLAG directive per .aff; repeated
    * identical lines are tolerated (they change nothing), but
    * CONFLICTING directives fail loudly — a `limit(1)` pick would
    * silently depend on scan order (which Spark does not guarantee
    * across partitions) and could flip the flag parser between runs
    * (ADVICE r6). */
  def affFlagMode(s: org.apache.spark.sql.SparkSession,
      path: String): String = {
    val modes = s.read.text(path)
      .where(col("value").rlike("^FLAG\\s+\\S"))
      .select(regexp_extract(col("value"), "^FLAG\\s+(\\S+)", 1))
      .distinct().collect().map(_.getString(0)).toSeq
    if (modes.size > 1)
      throw new IllegalArgumentException(
        s"conflicting FLAG directives in $path: ${modes.sorted.mkString(", ")} " +
          "— hunspell allows at most one; fix the .aff")
    modes.headOption.getOrElse("char")
  }

  /** LEGACY boolean view of [[affFlagMode]] — true for `FLAG num`
    * (comma-separated integer flags, `word/8,13`), false for the
    * classic one-character packing (`word/AB`, incl. `FLAG UTF-8`).
    * `FLAG long` (TWO characters per flag) cannot be represented by
    * this boolean, so it still fails loudly HERE — but it is a
    * supported input family since round 7: pass
    * `flagMode = affFlagMode(...)` to [[expandWithAffixes]] instead
    * of this boolean and `long` dictionaries parse correctly
    * (two-character chunking, spec-pinned). */
  def affUsesNumFlags(s: org.apache.spark.sql.SparkSession,
      path: String): Boolean = affFlagMode(s, path) match {
    case "num" => true
    case "long" => throw new IllegalArgumentException(
      "FLAG long (two-character flags) does not fit the boolean " +
        "num-vs-char view: per-character splitting would misparse " +
        "every flag. Pass flagMode = affFlagMode(...) to " +
        "expandWithAffixes (supported since round 7), or use " +
        "flagAware = false for the flag-blind over-approximation.")
    case _ => false
  }

  /** Hunspell affix morphology (F22, the SFX/PFX half REP expansion
    * left open): expand the wordlist with every single-rule affix
    * application — strip/append at the word end (SFX) or start (PFX)
    * where the condition matches — so inflected forms (`zmluva/8` +
    * `SFX 8 a y a` → `zmluvy`) pass spell membership.
    *
    * Flag gating is hunspell's: a flagged word applies exactly the
    * rules its flags name, an unflagged word in a flagged dictionary
    * takes no affixes. `flagMode` — feed it [[affFlagMode]]'s read of
    * the `.aff` FLAG directive — selects the flag-string parser:
    * `"num"` = comma-separated integers (`word/8,13`), `"long"` =
    * two-character chunks (`word/ABCD` = flags AB, CD — every FLAG
    * family hunspell defines is now supported), anything else =
    * the classic one character per flag (incl. `FLAG UTF-8`).
    * `flagAware = false` is the bare-wordlist mode: every
    * condition-matching rule applies to every word — an
    * over-approximation that errs toward accepting (fewer false
    * "misspelled", the failure direction P11's dummy-column ratio
    * prefers).
    *
    * Cross products follow hunspell: when an SFX rule AND a PFX rule
    * both sit in cross-product blocks (header flag `Y`) and the word
    * carries both flags, the prefix applies to the suffixed form too
    * ('lacna/10,1' → 'lacnejsia' → 'najlacnejsia'); a `N` block never
    * combines.
    *
    * Continuation classes (two-step chains, hunspell's other
    * composition mechanism): a rule whose append carries `/flags`
    * (`SFX 1 0 able/2 .`) gives its DERIVED form those flags, and the
    * form takes one more flag-gated affix pass (`work/1` → `workable`
    * → `workableness` when flag 2 appends `ness`). Hunspell allows
    * one continuation level on a suffix (never a chain of a chain),
    * so single-affix derivations chain exactly; the one remaining
    * delta is that PFX×SFX cross-product OUTPUTS do not re-enter the
    * chain (prefix + suffix + continuation suffix — a depth the
    * reference's dictionaries never exercise: zero `/flags` appends
    * at all). Flag-gated by nature, so it only runs in
    * `flagAware` mode — in the flag-blind over-approximation every
    * rule already applies to every word and a second blind pass would
    * manufacture forms no flag path licenses. Vacuous on the
    * reference's own sk_SK.aff (zero `/flags` appends, grep-verified
    * — COVERAGE.md), pinned by a synthetic-fixture spec.
    *
    * Cost note: dimension-side only, wordlist × matching rules once
    * before broadcast; flag-aware expansion is |dic| ×
    * avg-flags-per-word (the continuation pass only re-feeds forms
    * whose rule declared a class — zero rows for sk_SK.aff), the
    * flag-blind mode is |dic| × |rules| and is meant for small
    * wordlists. */
  def expandWithAffixes(dictionary: DataFrame, affixRules: DataFrame,
      flagAware: Boolean = true,
      flagMode: String = "char"): DataFrame = {
    val base =
      if (dictionary.columns.contains("flags"))
        dictionary.select(lower(col("word")).as("word"), col("flags"))
      else
        dictionary.select(lower(col("word")).as("word"),
          lit(null).cast("string").as("flags"))
    val sfx = affixRules.where(col("kind") === "SFX")
    val pfx = affixRules.where(col("kind") === "PFX")
    // single-affix forms, plus the suffixed cross-candidates re-run
    // through the cross-capable prefix rules (flag gating stays on
    // the STEM's flags, which applyAffixRules preserves). The cross
    // pass REUSES the suffixed frame — applyAffixRules emits the
    // applied rule's `cross` flag, so filtering it is the same row
    // set as re-running the cross-capable suffix rules over the base,
    // without paying the wordlist × SFX-rules join twice
    val suffixed = applyAffixRules(base, sfx, flagAware, flagMode)
    val prefixed = applyAffixRules(base, pfx, flagAware, flagMode)
    val crossed = applyAffixRules(suffixed.where(col("cross")),
      pfx.where(col("cross")), flagAware, flagMode)
    // two-step chains: forms whose rule carried a continuation class
    // re-enter one more pass with the CLASS as their flags (stem
    // flags no longer apply — hunspell gates the second affix on the
    // continuation flags alone). The second pass's rule KIND follows
    // hunspell's composition limits: a suffixed form may take a
    // second suffix or a circumfix prefix (all rules), but a PREFIXED
    // form may only take a suffix — twofold prefix stripping does not
    // exist without COMPLEXPREFIXES, so a prefix continuation naming
    // another prefix must not generate double-prefix forms
    val chained =
      if (!flagAware) Seq.empty[DataFrame]
      else {
        def contOf(df: DataFrame) = df.where(col("cont").isNotNull)
          .select(col("word"), col("cont").as("flags"))
        Seq(
          applyAffixRules(contOf(suffixed), affixRules,
            flagAware = true, flagMode),
          applyAffixRules(contOf(prefixed), sfx,
            flagAware = true, flagMode))
      }
    (Seq(base, suffixed, prefixed, crossed) ++ chained)
      .map(_.select("word"))
      .reduce(_ union _)
      .distinct()
  }

  /** One strip/append pass of `rules` over `words` (word, flags):
    * gate on the word's flags, test the rule condition at the
    * affected edge, emit the derived form still carrying the source
    * word's flags (so cross products can re-gate on the stem) plus
    * the applied RULE's continuation flags in `cont` (so
    * [[expandWithAffixes]] can run the two-step chain on forms whose
    * rule declared one). */
  private def applyAffixRules(words: DataFrame, rules: DataFrame,
      flagAware: Boolean, flagMode: String): DataFrame = {
    // FLAG num lists flags as comma-separated integers; FLAG long
    // packs TWO characters per flag (non-overlapping pairs — an
    // odd trailing char is malformed input and is dropped, as
    // hunspell warns); the classic format packs one character each
    val flagArr = flagMode match {
      case "num" => split(col("flags"), ",")
      case "long" => expr("regexp_extract_all(flags, '..', 0)")
      case _ => split(col("flags"), "")
    }
    words.select(col("word"), col("flags")).crossJoin(broadcast(rules))
      .where(
        if (flagAware) array_contains(flagArr, col("flag"))
        else lit(true))
      // hunspell refuses to strip a word to nothing unless the .aff
      // declares FULLSTRIP (sk_SK.aff does not; the option is not
      // supported here) — without the guard `SFX 8 a y a` over the
      // word 'a' would accept the bare append 'y'
      .where(length(col("word")) > length(col("strip")))
      // the cond fragment is wrapped in a non-capturing group before
      // anchoring: hunspell conds are literal/class sequences (never
      // alternation), but an unparenthesized fragment containing a
      // regex metacharacter would silently bind tighter than the
      // anchor. A cond that is not a valid regex fails the job loudly
      // — the conflicting-FLAG posture: corrupt dictionaries are
      // errors, not guesses
      .where(
        when(col("kind") === "SFX",
          col("word").endsWith(col("strip")) &&
            (col("cond") === "." ||
              expr("word RLIKE concat('(?:', cond, ')$')")))
          .otherwise(
            col("word").startsWith(col("strip")) &&
              (col("cond") === "." ||
                expr("word RLIKE concat('^(?:', cond, ')')"))))
      .select(
        when(col("kind") === "SFX",
          concat(expr("substring(word, 1, length(word) - length(strip))"),
            col("append")))
          .otherwise(concat(col("append"),
            expr("substring(word, length(strip) + 1)")))
          .as("word"),
        col("flags"), col("cont"), col("cross"))
  }

  /** F22 — spell(word): broadcast-set membership column (used by the
    * tables pipeline's dummy-column test P11). A word is known if it is
    * in the wordlist OR is a numeric/currency token. */
  def spellOk(words: DataFrame, dictionary: DataFrame): DataFrame =
    words.join(
      broadcast(dictionary.select(lower(col("word")).as("word"))
        .withColumn("known", lit(true)).distinct()),
      Seq("word"), "left")
      .withColumn("known",
        coalesce(col("known"), lit(false)) ||
          (col("word").rlike(numericTokenPattern) &&
            col("word").rlike(hasDigit)))
}
