#!/bin/bash
# Rebuild the REFERENCE renderer (pbrt-v1) in this image, for golden
# renders and baseline timings. Automates tools/build_reference.md:
# no flex/bison here (hand-written pbrtparse.cpp replaces the generated
# parser) and OpenEXR 3.x instead of 1.x. Produces /tmp/refbuild/bin/pbrt.
set -e
DST=${1:-/tmp/refbuild}
rm -rf "$DST"
cp -r /root/reference "$DST"
chmod -R u+w "$DST"
HERE="$(cd "$(dirname "$0")" && pwd)"
cp "$HERE/pbrtparse.cpp" "$DST/core/pbrtparse.cpp"
printf '// flex replaced by hand parser in pbrtparse.cpp\n' > "$DST/core/pbrtlex.cpp"
printf '// generated parser header not needed\n' > "$DST/core/pbrtparse.h"

python3 - "$DST" <<'PYEOF'
import sys
dst = sys.argv[1]
p = f"{dst}/Makefile"
s = open(p).read()
# Upstream's Makefile omits the bidirectional integrator from the
# default plugin list; golden10 needs it.
s = s.replace("INTEGRATORS  = directlighting emission irradiancecache \\",
              "INTEGRATORS  = directlighting emission irradiancecache "
              "bidirectional \\")
s = s.replace("EXRINCLUDE=-I/usr/local/include/OpenEXR -I/opt/local/include/OpenEXR -I/usr/local/include/OpenEXR",
              "EXRINCLUDE=-I/usr/include/OpenEXR -I/usr/include/Imath")
s = s.replace("EXRLIBDIR=-L/usr/local/lib -L/opt/local/lib", "EXRLIBDIR=")
s = s.replace("EXRLIBS=$(EXRLIBDIR) -Bstatic -lIex -lIlmImf -lIlmThread -lImath -lIex -lHalf -Bdynamic -lz",
              "EXRLIBS=-lOpenEXR -lIlmThread -lImath -lIex -lz")
s = s.replace("LEXLIB = -lfl", "LEXLIB = ")
s = s.replace("OPT=-O2 -msse2 -mfpmath=sse", "OPT=-O2 -fPIC -msse2 -mfpmath=sse")
s = s.replace("""core/pbrtlex.cpp: core/pbrtlex.l
	@echo "Lex'ing pbrtlex.l"
	@$(LEX) -o$@ core/pbrtlex.l
""", """core/pbrtlex.cpp: core/pbrtlex.l
	@echo "using hand-written pbrtlex.cpp"
	@touch core/pbrtlex.cpp
""")
s = s.replace("""core/pbrtparse.h core/pbrtparse.cpp: core/pbrtparse.y
	@echo "YACC'ing pbrtparse.y"
	@$(YACC) -o $@ core/pbrtparse.y
	@if [ -e core/pbrtparse.cpp.h ]; then /bin/mv core/pbrtparse.cpp.h core/pbrtparse.h; fi
	@if [ -e core/pbrtparse.hpp ]; then /bin/mv core/pbrtparse.hpp core/pbrtparse.h; fi
""", """core/pbrtparse.h core/pbrtparse.cpp: core/pbrtparse.y
	@echo "using hand-written pbrtparse.cpp"
	@touch core/pbrtparse.h core/pbrtparse.cpp
""")
open(p, "w").write(s)

for f in (f"{dst}/core/exrio.cpp", f"{dst}/exrcheck.cpp"):
    s = open(f).read()
    s = s.replace("#include <half.h>",
                  "#include <ImfHeader.h>\n#include <Imath/half.h>")
    if "exrio" in f:
        s = s.replace(
            'RgbaOutputFile file(name.c_str(), displayWindow, dataWindow, WRITE_RGBA);',
            'Header hdr(displayWindow, dataWindow);\n'
            '        hdr.compression() = ZIP_COMPRESSION;\n'
            '        RgbaOutputFile file(name.c_str(), hdr, WRITE_RGBA);')
    open(f, "w").write(s)
print("patched")
PYEOF

mkdir -p "$DST/objs" "$DST/bin"
make -C "$DST" -j2
echo "reference built: $DST/bin/pbrt (PBRT_SEARCHPATH=$DST/bin)"
