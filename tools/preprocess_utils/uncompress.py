# Copyright 2026. Apache License 2.0.
"""Download + archive extraction for the offline prep tools (reference
tools/preprocess_utils/uncompress.py:28-127): resume-skip download and
zip/tar extraction, delegating to the utils.download implementation."""

import os

from medicalseg_tpu.utils.download import _extract, _fetch


class uncompressor:
    """API-parity wrapper: ``uncompressor(download_params=(url, savepath,
    print_progress))`` downloads on construction when a url is given;
    ``._uncompress_file(filepath, extrapath, delete_file,
    print_progress)`` extracts archives."""

    def __init__(self, download_params=None, urls=None):
        if download_params is not None:
            url, savepath, print_progress = download_params
            if url and not os.path.exists(savepath):
                _fetch(url, savepath, print_progress)

    @staticmethod
    def _uncompress_file(filepath, extrapath, delete_file=False,
                         print_progress=True):
        root = _extract(filepath, extrapath, print_progress)
        if delete_file and os.path.exists(filepath):
            os.remove(filepath)
        return root
