"""Annotation CSV parsing and speaker indexing.

Reference: Data_Parser, ABCD-VAE/modules/data_utils.py:10-57.  Same schema:
columns ``input_path,onset,offset,data_type[,speaker][,label]``; onsets and
offsets in seconds; ``speaker2ix`` is injectable so a persisted
``speaker_coding.json`` survives resume (ABCD-VAE/learning.py:414-431).
"""

from __future__ import annotations

import os.path

import pandas as pd
import scipy.io.wavfile as spw

from .audio import SegmentDataset, WavCache


class AnnotationParser:
    def __init__(self, input_root: str, annotation_file: str,
                 data_type_col_name: str = "data_type",
                 annotation_sep: str = ",",
                 speaker2ix: dict | None = None):
        self.df_annotation = pd.read_csv(annotation_file, sep=annotation_sep)
        missing = ({"input_path", "onset", "offset"}
                   - set(self.df_annotation.columns))
        if missing:
            raise ValueError(
                f"annotation file {annotation_file} is missing required "
                f"column(s) {sorted(missing)}; expected "
                "input_path,onset,offset,data_type[,speaker][,label] "
                f"(found {list(self.df_annotation.columns)}). Check "
                "--annotation_sep if the file is not comma-separated.")
        self.input_root = input_root
        self.data_type_col_name = data_type_col_name
        self.wav_cache = WavCache(input_root)
        self._index_speakers(speaker2ix)

    def _index_speakers(self, speaker2ix: dict | None) -> None:
        """Stable string-keyed speaker -> int mapping
        (data_utils.py:23-31)."""
        if "speaker" in self.df_annotation.columns:
            self.df_annotation.loc[:, "speaker"] = (
                self.df_annotation.speaker.astype(str))
            if speaker2ix is None:
                self.speaker2ix = {
                    spk: ix for ix, spk
                    in enumerate(self.df_annotation.speaker.unique())}
            else:
                self.speaker2ix = speaker2ix
        else:
            self.speaker2ix = None

    def get_num_speakers(self) -> int:
        return 0 if self.speaker2ix is None else len(self.speaker2ix)

    def get_data(self, data_type: str | None = None,
                 channel: int = 0) -> SegmentDataset:
        """Filter rows by data_type ('train'/'valid'; None = all rows,
        the encode-script behavior) -> SegmentDataset."""
        if data_type is None:
            sub_df = self.df_annotation.copy()
        else:
            col = self.data_type_col_name
            sub_df = self.df_annotation[
                self.df_annotation[col] == data_type].copy()
        return SegmentDataset(sub_df, self.wav_cache, channel=channel,
                              speaker2ix=self.speaker2ix)

    def get_sample_freq(self, input_path: str | None = None) -> int:
        """fs of the first (or given) wav; all files are assumed to share it
        (data_utils.py:53-57)."""
        if input_path is None:
            input_path = self.df_annotation.loc[0, "input_path"]
        fs, _ = spw.read(os.path.join(self.input_root, input_path))
        return fs
