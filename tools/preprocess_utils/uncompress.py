# Copyright 2026. Apache License 2.0.
"""Download + archive extraction (reference tools/preprocess_utils/
uncompress.py:28-127): resume-skip download and zip/tar extraction with
progress, shared with the utils.download implementation."""

import os

from medicalseg_tpu.utils.download import (_download_file,
                                           _uncompress_file)


class uncompressor:
    """API-parity wrapper: ``uncompressor(download_params=(url, savepath,
    print_progress))`` downloads on construction when urls are given;
    ``._uncompress_file(filepath, extrapath, delete_file,
    print_progress)`` extracts archives."""

    def __init__(self, download_params=None, urls=None):
        if download_params is not None:
            url, savepath, print_progress = download_params
            if url:
                if not os.path.exists(savepath):
                    _download_file(url, savepath, print_progress)

    @staticmethod
    def _uncompress_file(filepath, extrapath, delete_file=False,
                         print_progress=True):
        return _uncompress_file(filepath, extrapath, delete_file,
                                print_progress)
