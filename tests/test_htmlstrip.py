"""HTMLStripCharFilter: clean-room char-filter stage
(``lucene/analysis/common/.../charfilter/HTMLStripCharFilter.java`` role)
+ indexing straight from an ``html:binary`` column."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.analysis.analyzer import Analyzer, analyzer_for_config
from lucene_ray.analysis.htmlstrip import html_strip, resolve_char_filters
from lucene_ray.corpus.generator import extract_text, wrap_html
from lucene_ray.index.build import build_index
from lucene_ray.index.config import IndexConfig
from lucene_ray.search.searcher import IndexSearcher


class TestHtmlStrip:
    def test_tags_become_spaces(self):
        assert html_strip("a<b>c</b>d").split() == ["a", "c", "d"]

    def test_script_style_content_dropped(self):
        s = html_strip(
            "before<script type='x'>var a = 'hidden';</script>"
            "<style>.c { color: red }</style>after"
        )
        assert "hidden" not in s and "color" not in s
        assert s.split() == ["before", "after"]

    def test_comments_and_doctype(self):
        s = html_strip("<!DOCTYPE html><!-- secret <b>x</b> -->ok")
        assert s.split() == ["ok"]

    def test_cdata_content_kept(self):
        assert html_strip("a<![CDATA[kept <notag>]]>b").split() == [
            "a", "kept", "<notag>b",
        ] or "kept" in html_strip("a<![CDATA[kept]]>b")

    def test_entities_decode_last(self):
        assert html_strip("fish &amp; chips &#65;").split() == [
            "fish", "&", "chips", "A",
        ]

    def test_bytes_input_decodes_utf8(self):
        assert html_strip("<p>café</p>".encode()).split() == ["café"]
        assert html_strip(None) == ""

    def test_unterminated_script_dropped_to_eof(self):
        assert "x" not in html_strip("a<script>var x")

    def test_registry(self):
        (f,) = resolve_char_filters(("html_strip",))
        assert f is html_strip
        with pytest.raises(ValueError):
            resolve_char_filters(("nope",))


class TestAnalyzerCharFilters:
    def test_all_paths_agree(self):
        a = Analyzer(char_filters=(html_strip,))
        raw = "<p>Hello &amp; <b>World</b></p><script>x=1</script>"
        fast, _ = a.analyze_fast(raw)
        full = [t for t, *_ in a.analyze(raw)]
        flat_terms, lengths, _ = a.analyze_flat([raw, "", b"<i>bytes</i>"])
        assert fast == full == ["hello", "world"]
        assert list(lengths) == [2, 0, 1]
        assert str(list(flat_terms)[-1]) == "bytes"


class TestIndexFromHtml:
    def test_html_index_matches_text_index(self, ray_session, tmp_path):
        """Indexing wrap_html(text) bytes with the char filter must score
        identically to indexing extract_text of the same pages wrapped
        with the boilerplate words inline."""
        texts = [
            "spark merge window",
            "merge sort sort",
            "the quick spark",
            "",
        ]
        htmls = [wrap_html(t) for t in texts]
        assert [extract_text(h) for h in htmls] == texts
        src_html = tmp_path / "html.parquet"
        src_text = tmp_path / "text.parquet"
        ids = list(range(len(texts)))
        pq.write_table(
            pa.table({"doc_id": ids, "html": pa.array(htmls, pa.binary())}),
            src_html,
        )
        # equivalent plain-text corpus: boilerplate words inlined
        eq = [
            f"page boilerplate nav links {t} footer boilerplate" for t in texts
        ]
        pq.write_table(pa.table({"doc_id": ids, "text": eq}), src_text)

        i1, i2 = str(tmp_path / "i1"), str(tmp_path / "i2")
        build_index(
            str(src_html), i1,
            IndexConfig(text_col="html", char_filters=("html_strip",)),
        )
        build_index(str(src_text), i2, IndexConfig())
        s1, s2 = IndexSearcher(i1), IndexSearcher(i2)
        for q in ("spark", "merge", "boilerplate", "sort the"):
            r1 = s1.search(q, k=10, mode="exhaustive")
            r2 = s2.search(q, k=10, mode="exhaustive")
            assert r1["keys"] == r2["keys"]
            assert (r1["scores"] == r2["scores"]).all()
