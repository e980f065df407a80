#!/usr/bin/env python3
"""Line-faithful port of LangChain's RecursiveCharacterTextSplitter, used to
generate golden cases for graft's Scala splitter (transform/RecursiveSplitter).

Provenance: the published langchain-text-splitters 0.3.x sources —
`langchain_text_splitters/character.py` (`RecursiveCharacterTextSplitter.
_split_text`, `_split_text_with_regex`) and `langchain_text_splitters/base.py`
(`TextSplitter._merge_splits`, `_join_docs`) — with the configuration the
reference uses (`/root/reference/micro-infobot/app.py:116-120`):
keep_separator=True ("start"), strip_whitespace=True, length_function=len,
is_separator_regex=False. langchain itself is not installable offline, so
this port *is* the oracle; it is an independent implementation (Python,
regex-based splitting) of the same published algorithm the Scala code
re-expresses, so agreement is a genuine cross-check, not self-reference.

Usage:
  python3 tools/langchain_splitter_oracle.py gen   # regenerate golden .scala
"""
import json
import re
import sys

CHUNK_SIZE = 500
CHUNK_OVERLAP = 50


def _split_text_with_regex(text, separator, keep_separator=True):
    # character.py::_split_text_with_regex, keep_separator == True ("start")
    if separator:
        if keep_separator:
            _splits = re.split(f"({separator})", text)
            splits = [_splits[i] + _splits[i + 1] for i in range(1, len(_splits), 2)]
            if len(_splits) % 2 == 0:
                splits += _splits[-1:]
            splits = [_splits[0]] + splits
        else:
            splits = re.split(separator, text)
    else:
        splits = list(text)
    return [s for s in splits if s != ""]


def _join_docs(docs, separator, strip_whitespace=True):
    # base.py::TextSplitter._join_docs
    text = separator.join(docs)
    if strip_whitespace:
        text = text.strip()
    return None if text == "" else text


def _merge_splits(splits, separator, chunk_size, chunk_overlap):
    # base.py::TextSplitter._merge_splits (length_function=len)
    separator_len = len(separator)
    docs = []
    current_doc = []
    total = 0
    for d in splits:
        _len = len(d)
        if total + _len + (separator_len if len(current_doc) > 0 else 0) > chunk_size:
            if len(current_doc) > 0:
                doc = _join_docs(current_doc, separator)
                if doc is not None:
                    docs.append(doc)
                while total > chunk_overlap or (
                    total + _len + (separator_len if len(current_doc) > 0 else 0)
                    > chunk_size
                    and total > 0
                ):
                    total -= len(current_doc[0]) + (
                        separator_len if len(current_doc) > 1 else 0
                    )
                    current_doc = current_doc[1:]
        current_doc.append(d)
        total += _len + (separator_len if len(current_doc) > 1 else 0)
    doc = _join_docs(current_doc, separator)
    if doc is not None:
        docs.append(doc)
    return docs


def split_text(text, chunk_size, chunk_overlap, separators):
    # character.py::RecursiveCharacterTextSplitter._split_text
    final_chunks = []
    separator = separators[-1]
    new_separators = []
    for i, _s in enumerate(separators):
        _separator = re.escape(_s)
        if _s == "":
            separator = _s
            break
        if re.search(_separator, text):
            separator = _s
            new_separators = separators[i + 1:]
            break
    _separator = re.escape(separator)
    splits = _split_text_with_regex(text, _separator, keep_separator=True)
    _good_splits = []
    _separator = ""  # keep_separator=True joins with ""
    for s in splits:
        if len(s) < chunk_size:
            _good_splits.append(s)
        else:
            if _good_splits:
                final_chunks.extend(
                    _merge_splits(_good_splits, _separator, chunk_size, chunk_overlap))
                _good_splits = []
            if not new_separators:
                final_chunks.append(s)
            else:
                final_chunks.extend(
                    split_text(s, chunk_size, chunk_overlap, new_separators))
    if _good_splits:
        final_chunks.extend(
            _merge_splits(_good_splits, _separator, chunk_size, chunk_overlap))
    return final_chunks


REF_SEPS = ["\n\n", "\n", ".", " "]          # app.py:119
LC_DEFAULT_SEPS = ["\n\n", "\n", " ", ""]    # library default

# LangChain's own unit-test input (published test_text_splitters suite).
LC_TEST_TEXT = (
    "Hi.\n\nI'm Harrison.\n\nHow? Are? You?\nOkay then f f f f.\n"
    "This is a weird text to write, but gotta test the splittingggg some how.\n\n"
    "Bye!\n\n-H."
)

PARA = ("Lorem ipsum dolor sit amet, consectetur adipiscing elit. "
        "Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua. "
        "Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris "
        "nisi ut aliquip ex ea commodo consequat.")


def cases():
    cs = []

    def add(name, text, size=CHUNK_SIZE, overlap=CHUNK_OVERLAP, seps=None):
        cs.append({
            "name": name, "text": text, "chunkSize": size,
            "chunkOverlap": overlap, "separators": seps or REF_SEPS,
            "expected": split_text(text, size, overlap, seps or REF_SEPS),
        })

    # The published library test vector, library-default separators.
    add("lc_published_vector", LC_TEST_TEXT, 10, 1, LC_DEFAULT_SEPS)
    add("lc_vector_ref_seps", LC_TEST_TEXT, 10, 1)
    # Reference config on paragraph-structured prose.
    add("two_paragraphs", PARA + "\n\n" + PARA)
    add("many_small_paragraphs", "\n\n".join(f"Para {i} body text." for i in range(40)))
    add("single_long_paragraph", PARA * 4)
    # Multi-separator fallthrough: no \n\n, then no \n, then sentences.
    add("sentences_only", ("A" * 120 + ". ") * 12, 200, 30)
    add("newlines_only", "\n".join("line %d with some words" % i for i in range(60)), 120, 20)
    add("spaces_only", " ".join(["word%d" % i for i in range(200)]), 80, 15)
    # Oversized unsplittable piece: a run longer than chunk_size with no
    # separator at all — must be emitted as-is (finest separator exhausted).
    add("unsplittable_run", "x" * 900)
    add("unsplittable_between", PARA + "\n\n" + "y" * 700 + "\n\n" + PARA)
    # With "" in the separator list the run IS split at character level.
    add("char_level_fallback", "z" * 23, 10, 3, ["\n\n", "\n", " ", ""])
    # Overlap-at-boundary behavior.
    add("exact_chunk_size", "a" * 499 + "\n\n" + "b" * 499)
    add("overlap_carry", ". ".join("sentence %02d" % i for i in range(50)) + ".", 100, 40)
    add("overlap_zero", ". ".join("s%d" % i for i in range(40)) + ".", 60, 0)
    add("overlap_near_size", ("alpha beta gamma delta " * 30).strip(), 60, 55)
    # Separator edge positions.
    add("leading_separators", "\n\n\n\nHello world. Tail text here.", 20, 5)
    add("trailing_separators", "Hello world. Tail text here.\n\n\n\n", 20, 5)
    add("consecutive_dots", "one...two....three..four.", 12, 4)
    add("dot_no_space", "a.b.c.d.e.f.g.h.i.j.k.l.m.n.o.p", 10, 3)
    add("mixed_blank_lines", "T1\n\n\nbody one\n\n\n\nT2\nbody two", 15, 4)
    # Whitespace stripping of emitted chunks.
    add("pad_whitespace", "   padded start. and end.   ", 18, 5)
    add("tabs_and_spaces", "col1\tcol2\tcol3 value value\tvalue", 14, 4)
    # Unicode (multibyte chars count as 1 via len()).
    add("unicode_accents", "café résumé naïve coöperate. ñandú über schließen.", 20, 6)
    add("unicode_cjk", "中文文本没有空格也没有句号只能整块输出" * 3, 25, 8)
    # Degenerate inputs.
    add("empty_text", "")
    add("only_separators", "\n\n \n. .\n\n", 20, 5)
    add("short_text", "tiny", 500, 50)
    add("single_separator_list", " ".join("w%d" % i for i in range(30)), 25, 10, [" "])
    # Reference-shaped document: ALL-CAPS titles + paragraphs (what the
    # sectionizer feeds the splitter per app.py:125-128).
    add("reference_shaped",
        "INTRODUCTION\n\n" + PARA + "\n\nMETHODS\n\n" + PARA + " " + PARA)
    add("size_one_overlap_zero", "ab cd ef gh", 1, 0)
    return cs


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "gen"
    cs = cases()
    if mode == "json":
        print(json.dumps(cs, indent=1))
        return
    # Emit a Scala test fixture: byte-identical expectations, escaped.
    def esc(s):
        out = []
        for ch in s:
            if ch == '\\':
                out.append('\\\\')
            elif ch == '"':
                out.append('\\"')
            elif ch == '\n':
                out.append('\\n')
            elif ch == '\t':
                out.append('\\t')
            elif ch == '\r':
                out.append('\\r')
            elif ord(ch) < 0x20 or ord(ch) > 0x7e:
                out.append('\\u%04x' % ord(ch))
            else:
                out.append(ch)
        return '"' + ''.join(out) + '"'

    lines = [
        "package graft.transform",
        "",
        "/** GENERATED by tools/langchain_splitter_oracle.py — do not edit.",
        "  *",
        "  * Golden chunk boundaries computed by a line-faithful Python port of",
        "  * the published LangChain RecursiveCharacterTextSplitter (see the",
        "  * generator's provenance header). Asserted byte-identical by",
        "  * RecursiveSplitterSpec.",
        "  */",
        "object LangChainGoldenCases {",
        "  final case class Golden(name: String, text: String, chunkSize: Int,",
        "      chunkOverlap: Int, separators: List[String], expected: List[String])",
        "",
        "  val all: List[Golden] = List(",
    ]
    for c in cs:
        seps = ", ".join(esc(s) for s in c["separators"])
        exp = ", ".join(esc(s) for s in c["expected"])
        lines.append("    Golden(%s, %s, %d, %d, List(%s), List(%s)),"
                     % (esc(c["name"]), esc(c["text"]), c["chunkSize"],
                        c["chunkOverlap"], seps, exp))
    lines[-1] = lines[-1].rstrip(",")
    lines += ["  )", "}", ""]
    path = "src/test/scala/graft/transform/LangChainGoldenCases.scala"
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {path}: {len(cs)} cases, "
          f"{sum(len(c['expected']) for c in cs)} expected chunks")


if __name__ == "__main__":
    main()
