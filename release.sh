#!/bin/bash
# Build source/wheel distributions (reference release.sh equivalent).
set -e

rm -rf dist build *.egg-info
python setup.py sdist bdist_wheel
echo "Artifacts:"
ls -l dist/
