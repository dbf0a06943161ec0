# Copyright 2026. Apache License 2.0.
"""Dataset / pretrained-weight fetching and unpacking.

Capability parity with the reference's downloader (medicalseg/utils/
download.py:40-163): fetch an archive URL, extract it, skip work already
done, optionally force a re-fetch, and return the extracted directory.
Implemented on stdlib :mod:`urllib` (streamed with a progress readout) and
whole-archive extraction; no third-party HTTP client.

Note: this build environment has no network egress — these helpers exist
for deployments that do; datasets can always be provided locally via
``data_root``/``dataset_root``.
"""

import os
import shutil
import sys
import tarfile
import time
import urllib.request
import zipfile

_CHUNK = 1 << 16


class _Progress:
    """Throttled single-line percentage readout."""

    def __init__(self, label, enabled=True, period=0.1):
        self._label = label
        self._enabled = enabled
        self._period = period
        self._stamp = 0.0

    def __call__(self, done, total, final=False):
        if not self._enabled:
            return
        now = time.monotonic()
        if not final and now - self._stamp < self._period:
            return
        self._stamp = now
        if total:
            pct = 100.0 * done / total
            sys.stdout.write("\r%s: %5.1f%% (%d/%d bytes)" %
                             (self._label, pct, done, total))
        else:
            sys.stdout.write("\r%s: %d bytes" % (self._label, done))
        if final:
            sys.stdout.write("\n")
        sys.stdout.flush()


def _fetch(url, dest, print_progress=True):
    """Stream ``url`` into ``dest`` (written via a .part temp file)."""
    tmp = dest + ".part"
    report = _Progress("Downloading %s" % os.path.basename(dest),
                       enabled=print_progress)
    with urllib.request.urlopen(url, timeout=30) as resp:
        total = int(resp.headers.get("Content-Length") or 0)
        done = 0
        with open(tmp, "wb") as out:
            while True:
                block = resp.read(_CHUNK)
                if not block:
                    break
                out.write(block)
                done += len(block)
                report(done, total)
        report(done, total, final=True)
    os.replace(tmp, dest)


def _extract(archive, into, print_progress=True):
    """Extract zip/tar ``archive`` under ``into``; return the root entry name.

    Returns ``None`` when the file is not a recognized archive.
    """
    if zipfile.is_zipfile(archive):
        opener, lister = zipfile.ZipFile, lambda f: f.namelist()
    elif tarfile.is_tarfile(archive):
        opener, lister = tarfile.open, lambda f: f.getnames()
    else:
        return None
    if print_progress:
        print("Extracting %s" % os.path.basename(archive))
    with opener(archive) as f:
        names = lister(f)
        if not names:
            raise ValueError("empty archive: %s" % archive)
        f.extractall(into)
    # Top-level entry the archive unpacks to (reference keys off this too).
    return names[0].split("/")[0]


def download_file_and_uncompress(url, savepath=None, extrapath=None,
                                 extraname=None, print_progress=True,
                                 cover=False, delete_file=False):
    """Fetch ``url`` into ``savepath`` and unpack it under ``extrapath``.

    Already-present results are reused (resume semantics, reference
    download.py:98-141); ``cover=True`` discards them first. Non-archive
    payloads are moved into a directory named ``extraname``. Returns the
    path of the extracted (or moved-to) directory.
    """
    savepath = savepath or "."
    extrapath = extrapath or "."
    os.makedirs(savepath, exist_ok=True)
    os.makedirs(extrapath, exist_ok=True)

    fname = url.rsplit("/", 1)[-1]
    archive_path = os.path.join(savepath, fname)
    stem = fname.rsplit(".", 1)[0] or fname
    default_target = os.path.join(extrapath, stem)
    target = (os.path.join(extrapath, extraname)
              if extraname is not None else default_target)

    if cover:
        for p in {archive_path, default_target, target}:
            if os.path.isdir(p):
                shutil.rmtree(p)
            elif os.path.exists(p):
                os.remove(p)

    if os.path.exists(target):
        return target

    if not os.path.exists(archive_path):
        _fetch(url, archive_path, print_progress)

    root = _extract(archive_path, extrapath, print_progress)
    if root is None:
        # Plain file: deliver it inside the target directory.
        os.makedirs(target, exist_ok=True)
        shutil.move(archive_path, os.path.join(target,
                                               os.path.basename(archive_path)))
        return target

    extracted = os.path.join(extrapath, root)
    if os.path.abspath(extracted) != os.path.abspath(target):
        if os.path.exists(target):
            shutil.rmtree(target)
        shutil.move(extracted, target)
    if delete_file and os.path.exists(archive_path):
        os.remove(archive_path)
    return target
