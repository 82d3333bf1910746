package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Character n-gram language identification after Cavnar & Trenkle,
  * "N-Gram-Based Text Categorization" (1994): rank the document's most
  * frequent character n-grams (n = 1..3 over space-padded tokens, the
  * paper's mixed-length profiles), compare against per-language ranked
  * profiles with the out-of-place distance, pick the closest profile.
  * Covers 15 languages across 6 scripts (Latin ×9, Han, Cyrillic,
  * kana/kanji, Hangul, Arabic, Greek) plus "und" for letterless text.
  *
  * Language profiles are built at startup from embedded seed sentences
  * (UDHR Article 1 — public domain, the de-facto standard language-ID
  * demo text — plus a plain common-function-word sentence per language),
  * so the operator is fully self-contained and deterministic; the DuckDB
  * oracle embeds the identical profiles as a VALUES table and mirrors
  * the ranking/distance arithmetic, giving this heuristic a full SQL
  * oracle rather than a golden fixture.
  *
  * Scale shape (same discipline as [[Repetition]]): ONE repartition on
  * doc_id pre-clusters the trigram explode, the (doc, trigram) count, the
  * per-doc rank window, the per-(doc, lang) distance aggregate, and the
  * final argmin window — hash(doc_id) satisfies every downstream
  * subset-key distribution, so the whole operator runs in a single
  * exchange. The language/profile tables are literal arrays (broadcast
  * by construction, ~10 langs × topK rows). Everything is explode +
  * codegen'd hash-aggregate — no UDFs, no driver loops.
  */
object LangIdTrigram {

  /** Seed text per supported language: UDHR Article 1 (public domain)
    * plus one original sentence of high-frequency function words — the
    * short UDHR paragraph alone under-covers everyday n-grams, which
    * makes the out-of-place absence penalty dominate.
    */
  val seeds: Map[String, String] = Map(
    "en" -> ("All human beings are born free and equal in dignity and rights. " +
      "They are endowed with reason and conscience and should act towards one " +
      "another in a spirit of brotherhood. " +
      "This is the house that we have seen in the city and it was not there " +
      "when they came to that place with their friends for the first time."),
    "es" -> ("Todos los seres humanos nacen libres e iguales en dignidad y " +
      "derechos y, dotados como están de razón y conciencia, deben comportarse " +
      "fraternalmente los unos con los otros. " +
      "Esta es la casa que hemos visto en la ciudad y no estaba allí cuando " +
      "ellos llegaron a ese lugar con sus amigos por primera vez."),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en dignité et en " +
      "droits. Ils sont doués de raison et de conscience et doivent agir les " +
      "uns envers les autres dans un esprit de fraternité. " +
      "C'est la maison que nous avons vue dans la ville et elle n'était pas " +
      "là quand ils sont venus à cet endroit avec leurs amis pour la première fois."),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten geboren. " +
      "Sie sind mit Vernunft und Gewissen begabt und sollen einander im Geist " +
      "der Brüderlichkeit begegnen. " +
      "Das ist das Haus das wir in der Stadt gesehen haben und es war nicht " +
      "da als sie mit ihren Freunden zum ersten Mal zu dem Ort kamen."),
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in dignità e " +
      "diritti. Essi sono dotati di ragione e di coscienza e devono agire gli " +
      "uni verso gli altri in spirito di fratellanza. " +
      "Questa è la casa che abbiamo visto nella città e non era lì quando " +
      "sono venuti a quel posto con i loro amici per la prima volta."),
    "pt" -> ("Todos os seres humanos nascem livres e iguais em dignidade e em " +
      "direitos. Dotados de razão e de consciência, devem agir uns para com os " +
      "outros em espírito de fraternidade. " +
      "Esta é a casa que vimos na cidade e não estava lá quando eles vieram " +
      "a esse lugar com os seus amigos pela primeira vez."),
    "nl" -> ("Alle mensen worden vrij en gelijk in waardigheid en rechten " +
      "geboren. Zij zijn begiftigd met verstand en geweten, en behoren zich " +
      "jegens elkander in een geest van broederschap te gedragen. " +
      "Dit is het huis dat wij in de stad hebben gezien en het was er niet " +
      "toen zij met hun vrienden voor de eerste keer naar die plaats kwamen."),
    "sv" -> ("Alla människor är födda fria och lika i värde och rättigheter. " +
      "De är utrustade med förnuft och samvete och bör handla gentemot " +
      "varandra i en anda av broderskap. " +
      "Detta är huset som vi har sett i staden och det var inte där när de " +
      "kom till platsen med sina vänner för första gången."),
    "da" -> ("Alle mennesker er født frie og lige i værdighed og rettigheder. " +
      "De er udstyret med fornuft og samvittighed, og de bør handle mod " +
      "hverandre i en broderskabets ånd. " +
      "Dette er huset som vi har set i byen og det var ikke der da de kom " +
      "til stedet med deres venner for første gang."),
    "zh" -> ("人人生而自由，在尊严和权利上一律平等。他们赋有理性和良心，并应以兄弟关系的精神相对待。" +
      "这是我们在城市里看到的房子，那天他们和朋友们第一次来到这个地方的时候它不在那里。"),
    "ru" -> ("Все люди рождаются свободными и равными в своем достоинстве и " +
      "правах. Они наделены разумом и совестью и должны поступать в отношении " +
      "друг друга в духе братства. " +
      "Это тот дом который мы видели в городе и его там не было когда они " +
      "пришли на это место со своими друзьями в первый раз."),
    "ja" -> ("すべての人間は、生まれながらにして自由であり、かつ、尊厳と権利とについて平等である。" +
      "人間は、理性と良心とを授けられており、互いに同胞の精神をもって行動しなければならない。" +
      "これは私たちが町で見た家で、彼らが友達と初めてこの場所に来たとき、それはそこにありませんでした。"),
    "ko" -> ("모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 동등하다. " +
      "인간은 천부적으로 이성과 양심을 부여받았으며 서로 형제애의 정신으로 행동하여야 한다. " +
      "이것은 우리가 도시에서 본 집인데 그들이 친구들과 처음 이 곳에 왔을 때 그것은 거기에 없었다."),
    "ar" -> ("يولد جميع الناس أحرارا متساوين في الكرامة والحقوق. وقد وهبوا عقلا " +
      "وضميرا وعليهم أن يعامل بعضهم بعضا بروح الإخاء. " +
      "هذا هو البيت الذي رأيناه في المدينة ولم يكن هناك عندما جاءوا إلى هذا " +
      "المكان مع أصدقائهم في المرة الأولى."),
    "el" -> ("Όλοι οι άνθρωποι γεννιούνται ελεύθεροι και ίσοι στην αξιοπρέπεια " +
      "και τα δικαιώματα. Είναι προικισμένοι με λογική και συνείδηση και " +
      "οφείλουν να συμπεριφέρονται μεταξύ τους με πνεύμα αδελφοσύνης. " +
      "Αυτό είναι το σπίτι που είδαμε στην πόλη και δεν ήταν εκεί όταν ήρθαν " +
      "σε αυτό το μέρος με τους φίλους τους για πρώτη φορά.")
  )

  /** Default profile depth (Cavnar–Trenkle use 1–400; short seeds saturate
    * well below that).
    */
  val defaultTopK = 100

  /** Local reference tokenizer/n-gram model — the SAME arithmetic the
    * Spark plan and the SQL oracle implement: lowercase, collapse
    * non-letter runs to spaces, pad each token with one space each side,
    * slide 1-, 2- and 3-char windows (mixed-length profiles, as in the
    * paper).
    */
  private[graft] def localTrigrams(text: String): Seq[String] =
    text.toLowerCase
      .replaceAll("[^\\p{L}]+", " ")
      .split(" ")
      .filter(_.nonEmpty)
      .toSeq
      .flatMap { tok =>
        val padded = s" $tok "
        (1 to 3).flatMap(n =>
          (0 to padded.length - n).map(i => padded.substring(i, i + n)))
      }

  /** (lang, trigram, rank) profile rows, rank 1 = most frequent; ties
    * break on the trigram's lexicographic order (mirrored everywhere).
    */
  def profileRows(topK: Int = defaultTopK): Seq[(String, String, Int)] =
    seeds.toSeq.sortBy(_._1).flatMap { case (lang, seed) =>
      localTrigrams(seed)
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (tg, c) => (-c, tg) }
        .take(topK)
        .zipWithIndex
        .map { case ((tg, _), i) => (lang, tg, i + 1) }
    }

  /** Classify every document: returns (doc_id, pred_lang); documents with
    * no letters at all predict "und".
    */
  def classify(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      topK: Int = defaultTopK
  ): DataFrame = {
    // Fallback for docs whose trigrams match NO language profile: they
    // tie every language at the constant N_doc·topK distance, and the
    // textbook argmin falls to the lexicographically first language.
    // "Has any trigram" ⟺ "text contains a letter" (any letter yields a
    // padded token and its 1-grams), so the eligible id set comes from
    // the RAW scan — joining it here instead of re-deriving ids from the
    // trigram frame keeps the explode pipeline single-consumer (a second
    // consumer recomputes the whole explode+count+rank chain).
    docs
      .filter(col(textCol).rlike("\\p{L}"))
      .select(col(idCol).as("doc_id"))
      .join(bestMatches(docs, textCol, idCol, topK), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit(seeds.keys.min)).as("pred_lang"))
  }

  /** Best matched language per doc (docs with no profile overlap at all
    * have no row — [[classify]]/[[classifyAll]] add the fallbacks).
    */
  private def bestMatches(
      docs: DataFrame, textCol: String, idCol: String, topK: Int): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .repartition(col("doc_id"))
    classifyFromTrigramRows(trigramRows(base), topK)
  }

  /** Weighted (doc_id, tg, tokn) rows of per-token padded 1/2/3-grams
    * (C&T pad tokens so n-grams never span a word boundary) for a
    * (doc_id, __text) frame: one row per (doc, DISTINCT token, gram
    * position) carrying that token's occurrence count, so
    * Σ tokn ≡ the per-occurrence gram count.
    *
    * Formulation notes:
    *   - Windows slide via explode-over-positions + projected
    *     `substring`s — whole-stage-codegen'd end to end. The
    *     `transform(sequence(...), substr)` alternative evaluates its
    *     lambda INTERPRETED per element (the
    *     [[graft.operators.Dedup.shingleRows]] lesson), which at corpus
    *     scale dominates this operator's wall time.
    *   - Tokens pre-aggregate to (doc, tok, count) BEFORE the gram
    *     explode: natural language repeats function words heavily
    *     (measured 2.33× on the sf0.1 fixture), so every downstream
    *     stage — the 3·L-per-token gram expansion, its string work, and
    *     the (doc, tg) hash-aggregate input — shrinks by that factor
    *     while the summed counts stay exactly the per-occurrence counts.
    *     The pre-count is an in-partition aggregate (hash(doc_id)
    *     clustering subsumes (doc_id, tok)); no exchange is added.
    */
  private def trigramRows(base: DataFrame): DataFrame =
    base
      .select(
        col("doc_id"),
        explode(split(regexp_replace(lower(col("__text")), "[^\\p{L}]+", " "), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tokn"))
      .select(col("doc_id"), concat(lit(" "), col("tok"), lit(" ")).as("ptok"), col("tokn"))
      .select(col("doc_id"), col("ptok"), col("tokn"),
        explode(sequence(lit(1), length(col("ptok")))).as("i"))
      .select(
        col("doc_id"),
        col("tokn"),
        explode(array((1 to 3).map { n =>
          when(col("i") + (n - 1) <= length(col("ptok")), col("ptok").substr(col("i"), lit(n)))
        }: _*)).as("tg"))
      .filter(col("tg").isNotNull)

  private def classifyFromTrigramRows(tgRows: DataFrame, topK: Int): DataFrame = {
    val spark = tgRows.sparkSession
    import spark.implicits._

    val wDoc = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("tg"))
    val docProfile = tgRows
      .groupBy("doc_id", "tg")
      .agg(sum(col("tokn")).as("cnt"))
      .withColumn("drank", row_number().over(wDoc))
      .filter(col("drank") <= topK)
      .select("doc_id", "tg", "drank")

    val profiles = profileRows(topK).toDF("lang", "tg", "lrank")

    // Out-of-place distance, MATCHED-ROWS-ONLY formulation. The textbook
    // form scores every (doc trigram × language) with absent trigrams
    // paying the max displacement: dist = Σ_match |dr−lr| +
    // (N_doc − n_match)·topK. Since N_doc·topK is constant per doc,
    //   dist = N_doc·topK − Σ_match (topK − |dr−lr|),
    // so argmin(dist) = argmax of the matched-rank reduction Σ_match
    // (topK − |dr−lr|) — and every match reduces strictly (ranks are in
    // 1..topK, so topK − |dr−lr| ≥ 1), meaning any matched language
    // beats every unmatched one. The crossJoin×languages (docs × topK ×
    // 15 rows — the operator's former hot stage) collapses to the inner
    // join on matching trigrams only (each doc trigram joins just the
    // languages containing it), bit-identical predictions (brute-force
    // parity in ExtensionsSpec; same tie-break: equal dist ⟺ equal
    // reduction → lang asc).
    val matched = docProfile
      .join(broadcast(profiles), Seq("tg"))
      .groupBy("doc_id", "lang")
      .agg(sum(lit(topK.toLong) - abs(col("drank") - col("lrank"))).as("__red"))

    val wBest = Window.partitionBy("doc_id").orderBy(col("__red").desc, col("lang"))
    matched
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("pred_lang"))
  }

  /** Classify with an "und" fallback for documents that produced no
    * trigrams (no letters): left-join the classification back onto the
    * full id set.
    */
  def classifyAll(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      topK: Int = defaultTopK
  ): DataFrame =
    // ONE left join covers both fallbacks ([[classify]] would chain a
    // second): matched → predicted lang; letters but no profile overlap
    // → lexicographic-first language; no letters → "und".
    docs
      .select(col(idCol).as("doc_id"),
        col(textCol).rlike("\\p{L}").as("__letters"))
      .join(bestMatches(docs, textCol, idCol, topK), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"),
          when(col("__letters"), lit(seeds.keys.min)).otherwise(lit("und")))
          .as("pred_lang"))
}
