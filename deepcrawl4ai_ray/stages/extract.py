"""Stateless extract + link-discovery map_batches stages (crawl path).

Re-expresses the reference's extraction pipeline as Arrow-batch
transforms:
- HTML→text extraction (M4; reference crawl.py:337-346 markdown config)
- link discovery + scope filter (M18; actions.py:246-247)
- html column dropped immediately after extraction (M12;
  utils.py:322-327 strips ``result.html`` before publishing)

Input batch: the FetchActor output (url, host, priority, round,
fetch_seq, html, warc_ts, lang, status).  Output adds ``text``,
``n_links`` and a ``links`` list<string> column (consumed by the
frontier router stage, then dropped before the Parquet sink).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extract import extract_links, extract_text


def make_extract_stage(exclude_external: bool = False):
    def extract_stage(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        urls = batch.column("url").to_pylist()
        status = batch.column("status").to_pylist()
        texts: list[str] = []
        links: list[list[str]] = []
        for html, url, st in zip(htmls, urls, status):
            if st == "ok" and html:
                texts.append(extract_text(html))
                links.append(extract_links(html, url, exclude_external=exclude_external))
            else:
                texts.append("")
                links.append([])
        n_links = pa.array([len(l) for l in links], pa.int32())
        return (
            batch.drop_columns(["html"])
            .append_column("text", pa.array(texts, pa.string()))
            .append_column("links", pa.array(links, pa.list_(pa.string())))
            .append_column("n_links", n_links)
        )

    return extract_stage
