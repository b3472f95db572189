"""Tag-filtered retrieval: tenant/language isolation inside the device
query — not a post-hoc result trim.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/tag_filtering.py
"""

from trueno_rag_tpu import Document, TagFilter, pipeline_builder

DOCS = [
    ("Acme's refund policy allows returns within 30 days of purchase.",
     ["tenant:acme", "lang:en", "topic:policy"]),
    ("Acme Q3 revenue grew 12% on subscription strength.",
     ["tenant:acme", "lang:en", "topic:finance"]),
    ("Globex refunds require a receipt and original packaging.",
     ["tenant:globex", "lang:en", "topic:policy"]),
    ("Die Rückerstattungsrichtlinie von Globex erfordert einen Beleg.",
     ["tenant:globex", "lang:de", "topic:policy"]),
]


def main() -> None:
    pipe = pipeline_builder().build()
    for text, tags in DOCS:
        pipe.index_document(Document(text), tags=tags)

    print("== tenant isolation (all=tenant:acme)")
    for r in pipe.query("refund policy", k=3,
                        tag_filter=TagFilter(all=("tenant:acme",))):
        print("  ", r.chunk.content[:60])

    print("== cross-tenant topic, English only (all=topic:policy+lang:en)")
    for r in pipe.query("refund policy", k=3,
                        tag_filter=TagFilter(all=("topic:policy", "lang:en"))):
        print("  ", r.chunk.content[:60])

    print("== everything but German (none=lang:de)")
    for r in pipe.query("Rückerstattung refund", k=4,
                        tag_filter=TagFilter(none=("lang:de",))):
        print("  ", r.chunk.content[:60])

    print("== unknown tag in `all` → provably empty")
    print("  ", pipe.query("refund", k=3, tag_filter=TagFilter(all=("tenant:nope",))))


if __name__ == "__main__":
    main()
