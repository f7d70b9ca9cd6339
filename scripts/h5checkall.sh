#!/bin/sh
# Cross-check every committed modern-layout HDF5 fixture with the
# independent pure-Python decoder (scripts/h5check_latest.py): decodes
# all data columns through each chunk-index / link / attribute storage
# flavor and compares values against the source parquet table. Repeat
# factors must match the h5make.py invocation recorded in FIXTURES.md.
set -e
cd "$(dirname "$0")/.."
N=${1:-/root/testdata/sf0.001/nation.parquet}
R=src/test/resources
python3 scripts/h5check_latest.py $R/nation_latest.hdf5   $N 1
python3 scripts/h5check_latest.py $R/nation_paged.hdf5    $N 1
python3 scripts/h5check_latest.py $R/nation_dense.hdf5    $N 1
python3 scripts/h5check_latest.py $R/nation_ea.hdf5       $N 1
python3 scripts/h5check_latest.py $R/nation_ea_sblk.hdf5  $N 60
python3 scripts/h5check_latest.py $R/nation_bt2.hdf5      $N 1
python3 scripts/h5check_latest.py $R/nation_edgeraw.hdf5  $N 1
python3 scripts/h5check_latest.py $R/nation_ea_paged.hdf5 $N 21
python3 scripts/h5check_latest.py $R/nation_dattr.hdf5    $N 1
# classic-layout vlen strings go through the classic checker, which
# dereferences the GCOL global heap
python3 scripts/h5check.py        $R/nation_vlen.hdf5     $N
# classic layout: the Scala WRITER cross-checked by the original
# independent reader (h5check.py) is exercised from Hdf5Spec
echo "all modern-layout fixtures cross-checked"
