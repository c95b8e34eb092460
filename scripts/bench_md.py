"""Shared BENCH.md marker-block updater for the bench harnesses
(submit_scaling_run / datascale_run / increment_bench — one splice
implementation instead of three hand-synced copies).

Each harness owns one `<!-- tag:begin -->…<!-- tag:end -->` block; an
update replaces ONLY that block, preserves everything outside it, and on
first write inserts before the 'Reference baseline:' anchor."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_updater(tag: str):
    begin = f"<!-- {tag}:begin -->"
    end = f"<!-- {tag}:end -->"

    def update(block: str):
        path = os.path.join(REPO, "BENCH.md")
        with open(path) as fh:
            text = fh.read()
        section = f"{begin}\n{block}\n{end}"
        if begin in text:
            if end not in text:
                raise RuntimeError(
                    f"BENCH.md has {begin} but its end marker was removed; "
                    f"restore {end} before re-running")
            pre = text[: text.index(begin)]
            post = text[text.index(end) + len(end):]
            text = pre + section + post
        else:
            anchor = "Reference baseline:"
            idx = text.index(anchor) if anchor in text else len(text)
            text = text[:idx] + section + "\n\n" + text[idx:]
        with open(path, "w") as fh:
            fh.write(text)

    return begin, end, update
