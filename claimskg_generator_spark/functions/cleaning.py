"""Pure cleaning-chain functions (shared by the Spark pandas UDFs and the
golden-test oracle so both sides agree byte-for-byte).

Each function replicates one cleaning chain of the reference generator;
citations point into /root/reference.
"""

import html
import json
import re
from urllib.parse import urlparse

from claimskg_generator_spark.constants.sources import SOURCE_URI_DICT

# Java-regex character class matching exactly the set Python's str.strip()
# removes (characters where str.isspace() is True).  Java's `\s` is
# ASCII-only by default, so scraped text padded with \xa0 /   etc.
# would diverge between the JVM column expressions and the Python oracle.
PY_STRIP_CLASS = (
    "[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\u1680\\u2000-\\u200A"
    "\\u2028\\u2029\\u202F\\u205F\\u3000]"
)
PY_STRIP_REGEX = f"^{PY_STRIP_CLASS}+|{PY_STRIP_CLASS}+$"

# Public URL-validation regex (Django-style), as used by the reference
# (claimskg/generator/__init__.py:26-32).
IS_VALID_URL_REGEX = re.compile(
    r"^(?:http|ftp)s?://"
    r"(?:(?:[A-Z0-9](?:[A-Z0-9-]{0,61}[A-Z0-9])?\.)+(?:[A-Z]{2,6}\.?|[A-Z0-9-]{2,}\.?)|"
    r"localhost|"
    r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})"
    r"(?::\d+)?"
    r"(?:/?|[/?]\S+)$",
    re.IGNORECASE,
)


def row_string_value(value) -> str:
    """Null -> empty-string coercion (reference claimskg/generator/__init__.py:49-53)."""
    if not value:
        return ""
    return value


def normalize_text_fragment(text: str) -> str:
    """'""' -> '"', then '"' -> "'" (reference claimskg/generator/__init__.py:140-141)."""
    return text.replace('""', '"').replace('"', "'")


def normalize_label(label: str) -> str:
    """Title normalization for duplicate alignment
    (reference claimskg/generator/__init__.py:798-799)."""
    return label.strip().lower().replace('"', "").replace("'", "")


def html_escape_ascii(text: str) -> bytes:
    """html.escape + ascii/xmlcharrefreplace encoding of the original rating
    alternateName (reference claimskg/generator/__init__.py:481-482)."""
    return html.escape(text).encode("ascii", "xmlcharrefreplace")


def clean_rating_value(raw: str):
    """Strip ``[ ] ' ,`` then float() if non-empty
    (reference claimskg/generator/__init__.py:489-496).  Returns None when
    nothing remains."""
    cleaned = (
        raw.replace("[", "").replace("]", "").replace("'", "").replace(",", "").strip()
    )
    if cleaned and len(cleaned) > 0:
        return float(cleaned)
    return None


def original_rating_slug(author_name: str, alternate_name: str, rating_value: str) -> str:
    """Sanitized slug for the original-rating URI
    (reference claimskg/generator/__init__.py:121-127)."""
    joined = "_".join([author_name, alternate_name, rating_value])
    return (
        joined.lower()
        .replace(" ", "_")
        .replace("\n", "_")
        .replace("[", "")
        .replace("]", "")
        .replace("'", "")
        .replace("\\", "")
        .strip()
        .replace("/", "")
        .replace("<", "")
        .replace(">", "")
    )


def split_keywords(keywords: str):
    """Split on ';' when present else ',' (reference
    claimskg/generator/__init__.py:378-381); caller strips each entry."""
    if ";" in keywords:
        return keywords.split(";")
    return keywords.split(",")


_JUNK_1 = "%20TARGET=prayer>adultery</A>%20was%20made%20public.%20</p>%0A"


def clean_citation_links(links: str, author_name: str):
    """Citation-link cleanup chain (reference
    claimskg/generator/__init__.py:412-437).

    Returns a list of ``(cleaned_link, citation_uri)`` pairs: ``cleaned_link``
    is what the reference appends to ``claim.links`` and ``citation_uri`` is
    the re-assembled URL emitted as the schema:citation object.
    """
    results = []
    if not links:
        return results
    author_homepage = SOURCE_URI_DICT[author_name]
    # The reference drops the final character before splitting (:415).
    for link in links[0:-1].split(","):
        stripped = link.strip()
        if (
            len(stripped) > 0
            and stripped[0] != "#"
            and IS_VALID_URL_REGEX.match(stripped)
            and stripped != author_homepage
        ):
            cleaned = (
                stripped.replace("\\", "")
                .replace(_JUNK_1, "")
                .replace('"', "")
                .replace("<img%20src=?", "")
                .replace(">", "")
                .replace("</", "")
                .replace("<", "")
            )
            parsed = urlparse(cleaned)
            is_correct = (
                all([parsed.scheme, parsed.netloc, parsed.path])
                and len(parsed.netloc.split(".")) > 1
                and "<img" not in cleaned
            )
            if is_correct:
                citation_uri = (
                    parsed.scheme
                    + "://"
                    + parsed.netloc
                    + parsed.path
                    + "?"
                    + parsed.query.replace("|", "%7C")
                    .replace("^", "%5E")
                    .replace("\\", "%5C")
                    .replace("{", "%7B")
                    .replace("}", "%7D")
                    .replace("&", "%26")
                    .replace("=", "%3D")
                )
                results.append((cleaned, citation_uri))
    return results


# JSON repair regexes (reference claimskg/generator/__init__.py:735-749).
_REPAIR_1 = re.compile('","{2}')
_REPAIR_2 = re.compile('"\n\t"')
_REPAIR_3 = re.compile(r"}\]\[\]")


def process_json(json_string):
    """Repair + parse a mention-annotation JSON array; malformed -> None,
    empty/sentinel -> [] (reference claimskg/generator/__init__.py:735-749)."""
    loaded = []
    if json_string:
        json_string = _REPAIR_1.sub(',"', json_string)
        json_string = _REPAIR_2.sub("", json_string)
        json_string = _REPAIR_3.sub("}]", json_string)
        if json_string == "[[][]]":
            loaded = []
        else:
            try:
                loaded = json.loads(json_string)
            except ValueError:
                loaded = None
    return loaded


def format_confidence_score(score) -> str:
    """round to 2 decimals, rendered through Python float repr (reference
    claimskg/generator/__init__.py:567-571)."""
    return str(round(float(score), 2))
