#!/usr/bin/env bash
# Format the C++ sources (taiyaki_tpu/decodeutil/*.cpp) to the repo style.
# Counterpart of the reference's misc/indent.sh (a GNU-indent wrapper);
# this image ships no C formatter, so use the first one found.
set -e
for tool in clang-format astyle indent; do
    if command -v "$tool" > /dev/null 2>&1; then
        case "$tool" in
            clang-format) exec clang-format -i --style=Google "$@" ;;
            astyle)       exec astyle --style=google -s4 -xC80 "$@" ;;
            indent)       exec indent -kr -brf -ci4 -cli4 -i4 -l80 -nut "$@" ;;
        esac
    fi
done
echo "indent.sh: no C/C++ formatter (clang-format/astyle/indent) on PATH" >&2
exit 1
