

class TestLanguageSegments:
    def test_multilingual_doc_splits_on_language_change(self, spark):
        from rust_triplets_spark.operators.lines import language_segments

        en = "the cat is in the house and it is a good day for the cat"
        de = "der hund ist ein hund und das ist der tag mit dem hund"
        fr = "le chat est un chat et la maison est pour le chat que"
        doc = "\n".join([en, en, de, fr, fr, fr])
        df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
        segs = sorted(
            (r["seg_idx"], r["lang"], r["n_lines"])
            for r in language_segments(df, "doc_id", "text").collect()
        )
        assert segs == [(0, "en", 2), (1, "de", 1), (2, "fr", 3)]

    def test_blank_lines_form_und_runs(self, spark):
        from rust_triplets_spark.operators.lines import language_segments

        en = "the cat is in the house and it is good"
        doc = en + "\n\n" + en
        df = spark.createDataFrame([(7, doc)], "doc_id long, text string")
        segs = sorted(
            (r["seg_idx"], r["lang"]) for r in
            language_segments(df, "doc_id", "text").collect()
        )
        assert segs == [(0, "en"), (1, "und"), (2, "en")]

    def test_char_counts_cover_doc(self, spark):
        from rust_triplets_spark.operators.lines import language_segments

        doc = "the a of and\nder und ist\nle et la"
        df = spark.createDataFrame([(3, doc)], "doc_id long, text string")
        rows = language_segments(df, "doc_id", "text").collect()
        # newlines are separators, not segment content
        assert sum(r["n_chars"] for r in rows) == len(doc.replace("\n", ""))
        assert sum(r["n_lines"] for r in rows) == 3
