# Copyright 2026. Apache License 2.0.
"""Download + uncompress helpers (reference: medicalseg/utils/download.py:40-163).

Host-side only; used for datasets and pretrained weights. Supports zip and
tar archives, skip-if-present resume semantics, and a progress bar.
"""

import functools
import os
import shutil
import sys
import tarfile
import time
import zipfile

lasttime = time.time()
FLUSH_INTERVAL = 0.1


def progress(str, end=False):
    global lasttime
    if end:
        str += "\n"
        lasttime = 0
    if time.time() - lasttime >= FLUSH_INTERVAL:
        sys.stdout.write("\r%s" % str)
        lasttime = time.time()
        sys.stdout.flush()


def _download_file(url, savepath, print_progress=True):
    import requests
    if print_progress:
        print("Connecting to {}".format(url))
    r = requests.get(url, stream=True, timeout=15)
    total_length = r.headers.get("content-length")

    if total_length is None:
        with open(savepath, "wb") as f:
            shutil.copyfileobj(r.raw, f)
    else:
        with open(savepath, "wb") as f:
            dl = 0
            total_length = int(total_length)
            starttime = time.time()
            if print_progress:
                print("Downloading %s" % os.path.basename(savepath))
            for data in r.iter_content(chunk_size=4096):
                dl += len(data)
                f.write(data)
                if print_progress:
                    done = int(50 * dl / total_length)
                    progress("[%-50s] %.2f%%" %
                             ("=" * done, float(100 * dl) / total_length))
        if print_progress:
            progress("[%-50s] %.2f%%" % ("=" * 50, 100), end=True)


def _uncompress_file_zip(filepath, extrapath):
    with zipfile.ZipFile(filepath, "r") as files:
        filelist = files.namelist()
        rootpath = filelist[0]
        total_num = len(filelist)
        for index, file in enumerate(filelist):
            files.extract(file, extrapath)
            yield total_num, index, rootpath


def _uncompress_file_tar(filepath, extrapath, mode="r:gz"):
    with tarfile.open(filepath, mode) as files:
        filelist = files.getnames()
        total_num = len(filelist)
        rootpath = filelist[0]
        for index, file in enumerate(filelist):
            files.extract(file, extrapath)
            yield total_num, index, rootpath


def _uncompress_file(filepath, extrapath, delete_file, print_progress):
    if print_progress:
        print("Uncompress %s" % os.path.basename(filepath))

    if filepath.endswith("zip"):
        handler = _uncompress_file_zip
    elif filepath.endswith("tgz") or filepath.endswith("tar.gz"):
        handler = functools.partial(_uncompress_file_tar, mode="r:gz")
    elif filepath.endswith("tar"):
        handler = functools.partial(_uncompress_file_tar, mode="r:")
    else:
        # single file, no archive
        return os.path.basename(filepath)

    for total_num, index, rootpath in handler(filepath, extrapath):
        if print_progress:
            done = int(50 * float(index) / total_num)
            progress("[%-50s] %.2f%%" %
                     ("=" * done, float(100 * index) / total_num))
    if print_progress:
        progress("[%-50s] %.2f%%" % ("=" * 50, 100), end=True)

    if delete_file:
        os.remove(filepath)

    return rootpath


def download_file_and_uncompress(url,
                                 savepath=None,
                                 extrapath=None,
                                 extraname=None,
                                 print_progress=True,
                                 cover=False,
                                 delete_file=False):
    """Download ``url`` into ``savepath`` and extract into ``extrapath``.

    Skips both steps when the target already exists (resume semantics,
    reference download.py:98-141). Returns the extracted path.
    """
    if savepath is None:
        savepath = "."
    if extrapath is None:
        extrapath = "."
    savename = url.split("/")[-1]
    if not os.path.exists(savepath):
        os.makedirs(savepath)
    savepath = os.path.join(savepath, savename)
    savename = ".".join(savename.split(".")[:-1]) or savename
    savename = os.path.join(extrapath, savename)
    extraname = savename if extraname is None else os.path.join(
        extrapath, extraname)

    if cover:
        if os.path.exists(savepath):
            shutil.rmtree(savepath)
        if os.path.exists(savename):
            shutil.rmtree(savename)
        if os.path.exists(extraname):
            shutil.rmtree(extraname)

    if not os.path.exists(extraname):
        if not os.path.exists(savename):
            if not os.path.exists(savepath):
                _download_file(url, savepath, print_progress)

            if (not tarfile.is_tarfile(savepath) and
                    not zipfile.is_zipfile(savepath)):
                if not os.path.exists(extraname):
                    os.makedirs(extraname)
                shutil.move(savepath, extraname)
                return extraname

            savename = _uncompress_file(savepath, extrapath, delete_file,
                                        print_progress)
            savename = os.path.join(extrapath, savename)
    if savename != extraname:
        shutil.move(savename, extraname)
    return extraname
