"""Extraction configuration — the engine's "query language".

A parse query is a config object (reference: html_parser.py:94-106,
366-425).  Three production configs exist in the reference and are
exposed here as named factories (SURVEY.md §1.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

INF = float("inf")
NEG_INF = -float("inf")


@dataclass
class TagToRemove:
    """Drop the span record but keep the text (reference: html_parser.py:94-98)."""

    tag: str
    content_min_char_length: float = 0
    content_max_char_length: float = INF


@dataclass
class TagToRemoveWithContent:
    """Delete whole subtrees by tag + length predicate (reference: html_parser.py:101-106)."""

    tag: str
    content_min_char_length: float = 0
    content_max_char_length: float = INF
    method: str = "top-down"  # or "bottom-up"


@dataclass
class DensityPruneConfig:
    """Text/link-density boilerplate scoring (north-star heuristic the
    reference itself lacks; rules are the published JusText/Boilerpipe
    family, simplified to two deterministic tests).  A candidate block
    subtree is pruned when

    * its link density (chars under ``<a>`` descendants / all text
      chars) reaches ``max_link_density`` — nav bars, link farms,
      "related articles" boxes; or
    * it has fewer than ``min_text_length`` text chars AND contains a
      link — short link-y stubs ("read more", breadcrumbs).

    Plain short paragraphs with no links are never pruned, so body
    text is safe at any length."""

    max_link_density: float = 0.5
    min_text_length: int = 25
    candidate_tags: tuple = (
        "div", "nav", "ul", "ol", "table", "aside", "section", "menu",
    )


@dataclass
class ExtractionConfig:
    """All knobs of the extraction kernel (reference: html_parser.py:366-382)."""

    tags_to_remove_with_content: list[TagToRemoveWithContent] | None = None
    tags_to_remove_alone: list[TagToRemove] | None = None
    attrs_to_keep: list[str] | None = None
    start_parsing_at_tag: str | None = "body"
    consecutive_tags_to_fold: list[str] | None = None
    convert_br_tag_to_breaking_line: bool = False
    txt_max_chr_len_alone: float = NEG_INF
    txt_min_chr_len_alone: float = NEG_INF
    tags_exceptions_alone: list[str] | None = None
    txt_max_chr_len_with_content: float = NEG_INF
    txt_min_chr_len_with_content: float = NEG_INF
    tags_exceptions_with_content: list[str] | None = None
    density_prune: DensityPruneConfig | None = None


def keep_everything_config() -> ExtractionConfig:
    """All defaults (reference: parse_natural_questions.py:44-48)."""
    return ExtractionConfig()


def boilerplate_strip_config() -> ExtractionConfig:
    """Remove script/style/header/iframe/footer/form subtrees, fold div
    chains (reference: parse_scripts/parse_natural_questions_Toy_v2.py:57-94).
    """
    return ExtractionConfig(
        tags_to_remove_with_content=[
            TagToRemoveWithContent(tag="script"),
            TagToRemoveWithContent(tag="style"),
            TagToRemoveWithContent(tag="header"),
            TagToRemoveWithContent(tag="iframe"),
            TagToRemoveWithContent(tag="footer"),  # copyright in footer
            TagToRemoveWithContent(tag="form"),
        ],
        tags_to_remove_alone=[],
        consecutive_tags_to_fold=["div"],
    )


def boilerplate_strip_br_config() -> ExtractionConfig:
    """Boilerplate strip + <br> → newline (reference:
    parse_scripts/parse_natural_questions_Toy_keep_everything.py:57-105)."""
    cfg = boilerplate_strip_config()
    cfg.convert_br_tag_to_breaking_line = True
    return cfg


def density_prune_config() -> ExtractionConfig:
    """Boilerplate strip + text/link-density block scoring — the
    north-star heuristic layer (beyond the reference's tag-rule-only
    configs)."""
    cfg = boilerplate_strip_config()
    cfg.density_prune = DensityPruneConfig()
    return cfg


NAMED_CONFIGS = {
    "keep_everything": keep_everything_config,
    "boilerplate_strip": boilerplate_strip_config,
    "boilerplate_strip_br": boilerplate_strip_br_config,
    "density_prune": density_prune_config,
}
