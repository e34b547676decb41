"""Composed MEDIA curation pipeline — the multimodal twin of
plans/curation.py curate_documents.

Stages, in pipeline order:

1. **Feature extraction** — one Arrow decode pass
   (operators/multimodal.extract_real_features): every dependency-free
   format decodes for real (netpbm/BMP/PNG/GIF/JPEG pixels, WAV
   samples, MP4/FLAC/MP3 container metadata); undecodable blobs come
   back ``unknown``/``corrupt``.
2. **Structural quality filter** — plain Column predicates on the
   feature table: drop corrupt/unknown blobs, images below a minimum
   resolution, clips outside a duration band. This is metadata-only:
   no second look at the bytes.
3. **Perceptual near-dup keeper** — dHash for images, the spectral
   hash for audio (one more Arrow pass over SURVIVORS only), the
   shared 64-bit chunk-band join for candidate pairs, alternating-CC
   clustering, and one keeper (minimum media_id) per cluster — the
   same keeper convention as the text pipeline.
4. **Normalization** — survivors' images resized to ``resize_max_px``
   and re-encoded (PNG stays PNG, JPEG stays JPEG, GIFs stay
   animated); audio/video pass through.

Scale notes: the media table is filtered BEFORE fingerprinting (cheap
metadata predicates cut the expensive perceptual pass), fingerprints
are 8 bytes per asset so the near-dup join never touches pixel data,
and the filtered survivor set is persisted because stages 3 and 4 both
consume it (mirrors curate_documents' boundary persists). Every stage
is a DataFrame -> DataFrame function usable on its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import connected_components_alternating
from ..operators.multimodal import (
    audio_fingerprints,
    extract_real_features,
    hash64_near_duplicates,
    image_dhash,
    resize_images,
)

__all__ = ["curate_media", "near_dup_keepers"]

_IMAGE_FORMATS = ("ppm", "pgm", "bmp", "png", "gif", "jpeg")
_AUDIO_FORMATS = ("wav", "flac", "mp3")


def near_dup_keepers(
    fingerprints: DataFrame,
    hash_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """(media_id, cluster_id, is_keeper) from an (media_id, hash) table:
    band-join pairs -> alternating-CC clusters -> keeper = min id.
    Assets with no near-dup partner (or no fingerprint) are their own
    keeper."""
    pairs = hash64_near_duplicates(
        fingerprints, hash_col=hash_col, max_hamming=max_hamming
    )
    clusters = connected_components_alternating(pairs)
    return (
        fingerprints.select(F.col("media_id"))
        .join(
            clusters.select(
                F.col("id").alias("media_id"),
                F.col("component").alias("cluster_id"),
            ),
            "media_id",
            "left",
        )
        .select(
            "media_id",
            F.coalesce(F.col("cluster_id"), F.col("media_id")).alias(
                "cluster_id"
            ),
        )
        .withColumn(
            "is_keeper", F.col("media_id") == F.col("cluster_id")
        )
    )


def curate_media(
    media: DataFrame,
    min_width: int = 32,
    min_height: int = 32,
    min_duration_s: float = 0.5,
    max_duration_s: float = 3600.0,
    max_hamming: int = 3,
    resize_max_px: int | None = 512,
    persist_intermediates: bool = True,
) -> DataFrame:
    """Returns the curated media table: (media_id, kind, content, mime,
    n_bytes, format, width, height, channels, duration_s, cluster_id)
    — decodable, quality-filtered, one keeper per perceptual near-dup
    cluster, images resized/re-encoded.

    ``media``: the MEDIA_SCHEMA shape (media_id, kind, content, mime,
    n_bytes)."""
    feats = extract_real_features(media)
    ok = feats.filter(~F.col("format").isin("unknown", "corrupt"))
    is_image = F.col("format").isin(*_IMAGE_FORMATS)
    is_audio = F.col("format").isin(*_AUDIO_FORMATS)
    quality = ok.filter(
        (
            is_image
            & (F.col("width") >= min_width)
            & (F.col("height") >= min_height)
        )
        | (
            is_audio
            & F.col("duration_s").between(min_duration_s, max_duration_s)
        )
        | (~is_image & ~is_audio)  # containers (mp4): keep, frame
        # decode is downstream
    )
    survivors = media.join(
        quality.select(
            "media_id", "format", "width", "height", "channels",
            "duration_s",
        ),
        "media_id",
    )
    if persist_intermediates:
        survivors = survivors.persist()

    img_media = survivors.filter(F.col("format").isin(*_IMAGE_FORMATS))
    aud_media = survivors.filter(F.col("format") == "wav")
    img_keep = near_dup_keepers(
        image_dhash(img_media), "dhash", max_hamming
    )
    aud_keep = near_dup_keepers(
        audio_fingerprints(aud_media), "ahash", max_hamming
    )
    keepers = img_keep.unionByName(aud_keep)
    kept = survivors.join(keepers, "media_id", "left").filter(
        F.coalesce(F.col("is_keeper"), F.lit(True))
    )
    kept = kept.withColumn(
        "cluster_id", F.coalesce(F.col("cluster_id"), F.col("media_id"))
    ).drop("is_keeper")

    if resize_max_px is not None:
        media_cols = ["media_id", "kind", "content", "mime", "n_bytes"]
        resized = resize_images(
            kept.select(*media_cols), max_px=resize_max_px
        )
        kept = resized.join(
            kept.drop("content", "n_bytes", "mime", "kind"), "media_id"
        )
    return kept
