// Hand-written replacement for the flex/bison scene parser (this build
// image has no flex/bison). Implements the same surface: tokenizer for
// strings / numbers / brackets / '#' comments, nested Include, typed
// parameter lists building ParamSets via the public Add* API, and a
// directive dispatcher calling the corresponding pbrt*() API functions.
#include "api.h"
#include "paramset.h"
#include "color.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <string>
#include <vector>
using std::string;
using std::vector;

FILE *yyin = NULL;
int yydebug = 0;
string current_file;
int line_num = 0;

namespace {

struct Tok {
    enum Kind { END, STR, NUM, LBRACK, RBRACK, ID } kind;
    string s;
    double num;
};

struct FileCtx {
    FILE *f;
    string name;
    int line;
};

vector<FileCtx> fstack;

int nextc() {
    while (!fstack.empty()) {
        int c = fgetc(fstack.back().f);
        if (c == EOF) {
            // Root file (yyin) is closed by parser.cpp after yyparse.
            if (fstack.size() > 1 && fstack.back().f != stdin)
                fclose(fstack.back().f);
            fstack.pop_back();
            if (!fstack.empty()) {
                current_file = fstack.back().name;
                line_num = fstack.back().line;
            }
            continue;
        }
        if (c == '\n') { ++line_num; fstack.back().line = line_num; }
        return c;
    }
    return EOF;
}

int peeked = -2;

int getch() {
    if (peeked != -2) { int c = peeked; peeked = -2; return c; }
    return nextc();
}

void ungetch(int c) { peeked = c; }

bool lex(Tok *t) {
    for (;;) {
        int c = getch();
        if (c == EOF) { t->kind = Tok::END; return false; }
        if (isspace(c)) continue;
        if (c == '#') {
            while (c != EOF && c != '\n') c = getch();
            continue;
        }
        if (c == '[') { t->kind = Tok::LBRACK; return true; }
        if (c == ']') { t->kind = Tok::RBRACK; return true; }
        if (c == '"') {
            t->kind = Tok::STR;
            t->s.clear();
            for (;;) {
                c = getch();
                if (c == EOF || c == '"') break;
                if (c == '\\') {
                    int d = getch();
                    if (d == 'n') c = '\n';
                    else c = d;
                }
                t->s += (char)c;
            }
            return true;
        }
        if (isdigit(c) || c == '-' || c == '+' || c == '.') {
            string buf;
            buf += (char)c;
            for (;;) {
                c = getch();
                if (c == EOF || !(isdigit(c) || c == '.' || c == 'e' ||
                                  c == 'E' || c == '-' || c == '+')) {
                    ungetch(c);
                    break;
                }
                buf += (char)c;
            }
            t->kind = Tok::NUM;
            t->num = atof(buf.c_str());
            return true;
        }
        // bare identifier (directive)
        {
            string buf;
            buf += (char)c;
            for (;;) {
                c = getch();
                if (c == EOF || !(isalnum(c) || c == '_')) {
                    ungetch(c);
                    break;
                }
                buf += (char)c;
            }
            t->kind = Tok::ID;
            t->s = buf;
            return true;
        }
    }
}

bool have_pending = false;
Tok pending;

bool peek(Tok *t) {
    if (!have_pending) {
        if (!lex(&pending)) { t->kind = Tok::END; return false; }
        have_pending = true;
    }
    *t = pending;
    return true;
}

bool next(Tok *t) {
    if (have_pending) { *t = pending; have_pending = false; return true; }
    return lex(t);
}

double expect_num() {
    Tok t;
    if (!next(&t) || t.kind != Tok::NUM) {
        Error("Expected number near line %d of %s", line_num,
              current_file.c_str());
        return 0.0;
    }
    return t.num;
}

string expect_str() {
    Tok t;
    if (!next(&t) || t.kind != Tok::STR) {
        Error("Expected string near line %d of %s", line_num,
              current_file.c_str());
        return "";
    }
    return t.s;
}

// Parameter list: ("type name" value | "type name" [ values ])* until the
// next bare identifier.
void parse_params(ParamSet &ps) {
    for (;;) {
        Tok t;
        if (!peek(&t) || t.kind != Tok::STR) return;
        next(&t);
        string decl = t.s;
        // split type + name
        size_t i = 0;
        while (i < decl.size() && isspace(decl[i])) ++i;
        size_t j = i;
        while (j < decl.size() && !isspace(decl[j])) ++j;
        string type = decl.substr(i, j - i);
        while (j < decl.size() && isspace(decl[j])) ++j;
        string name = decl.substr(j);

        vector<double> nums;
        vector<string> strs;
        Tok v;
        if (!peek(&v)) return;
        if (v.kind == Tok::LBRACK) {
            next(&v);
            for (;;) {
                if (!next(&v)) return;
                if (v.kind == Tok::RBRACK) break;
                if (v.kind == Tok::NUM) nums.push_back(v.num);
                else if (v.kind == Tok::STR) strs.push_back(v.s);
            }
        } else if (v.kind == Tok::NUM) {
            next(&v);
            nums.push_back(v.num);
        } else if (v.kind == Tok::STR) {
            next(&v);
            strs.push_back(v.s);
        } else {
            Error("Parameter \"%s\" has no value (line %d of %s)",
                  decl.c_str(), line_num, current_file.c_str());
            return;
        }

        int n = (int)nums.size();
        if (type == "float") {
            vector<float> d(nums.begin(), nums.end());
            ps.AddFloat(name, d.empty() ? NULL : &d[0], n);
        } else if (type == "integer") {
            vector<int> d(n);
            for (int k = 0; k < n; ++k) d[k] = (int)nums[k];
            ps.AddInt(name, d.empty() ? NULL : &d[0], n);
        } else if (type == "bool") {
            vector<bool> d;
            for (size_t k = 0; k < strs.size(); ++k)
                d.push_back(strs[k] == "true");
            // AddBool takes bool*; vector<bool> has no data() of bool*
            vector<char> raw(d.size());
            for (size_t k = 0; k < d.size(); ++k) raw[k] = d[k];
            ps.AddBool(name, raw.empty() ? NULL : (bool *)&raw[0],
                       (int)raw.size());
        } else if (type == "point") {
            vector<Point> d(n / 3);
            for (int k = 0; k + 2 < n; k += 3)
                d[k / 3] = Point((float)nums[k], (float)nums[k + 1],
                                 (float)nums[k + 2]);
            ps.AddPoint(name, d.empty() ? NULL : &d[0], n / 3);
        } else if (type == "vector") {
            vector<Vector> d(n / 3);
            for (int k = 0; k + 2 < n; k += 3)
                d[k / 3] = Vector((float)nums[k], (float)nums[k + 1],
                                  (float)nums[k + 2]);
            ps.AddVector(name, d.empty() ? NULL : &d[0], n / 3);
        } else if (type == "normal") {
            vector<Normal> d(n / 3);
            for (int k = 0; k + 2 < n; k += 3)
                d[k / 3] = Normal((float)nums[k], (float)nums[k + 1],
                                  (float)nums[k + 2]);
            ps.AddNormal(name, d.empty() ? NULL : &d[0], n / 3);
        } else if (type == "color" || type == "rgb" ||
                   type == "spectrum") {
            vector<Spectrum> d(n / COLOR_SAMPLES);
            for (int k = 0; k + COLOR_SAMPLES - 1 < n;
                 k += COLOR_SAMPLES) {
                float cs[COLOR_SAMPLES];
                for (int m = 0; m < COLOR_SAMPLES; ++m)
                    cs[m] = (float)nums[k + m];
                d[k / COLOR_SAMPLES] = Spectrum(cs);
            }
            ps.AddSpectrum(name, d.empty() ? NULL : &d[0],
                           n / COLOR_SAMPLES);
        } else if (type == "string") {
            vector<string> d(strs);
            ps.AddString(name, d.empty() ? NULL : &d[0], (int)d.size());
        } else if (type == "texture") {
            if (!strs.empty()) ps.AddTexture(name, strs[0]);
        } else {
            Error("Unknown parameter type \"%s\" (line %d of %s)",
                  type.c_str(), line_num, current_file.c_str());
        }
    }
}

void dispatch(const string &d) {
    if (d == "Identity") pbrtIdentity();
    else if (d == "Translate") {
        float x = expect_num(), y = expect_num(), z = expect_num();
        pbrtTranslate(x, y, z);
    } else if (d == "Rotate") {
        float a = expect_num(), x = expect_num(), y = expect_num(),
              z = expect_num();
        pbrtRotate(a, x, y, z);
    } else if (d == "Scale") {
        float x = expect_num(), y = expect_num(), z = expect_num();
        pbrtScale(x, y, z);
    } else if (d == "LookAt") {
        float v[9];
        for (int i = 0; i < 9; ++i) v[i] = expect_num();
        pbrtLookAt(v[0], v[1], v[2], v[3], v[4], v[5], v[6], v[7], v[8]);
    } else if (d == "ConcatTransform" || d == "Transform") {
        Tok t;
        peek(&t);
        bool brack = (t.kind == Tok::LBRACK);
        if (brack) next(&t);
        float m[16];
        for (int i = 0; i < 16; ++i) m[i] = expect_num();
        if (brack) { next(&t); /* RBRACK */ }
        if (d == "Transform") pbrtTransform(m);
        else pbrtConcatTransform(m);
    } else if (d == "CoordinateSystem") pbrtCoordinateSystem(expect_str());
    else if (d == "CoordSysTransform") pbrtCoordSysTransform(expect_str());
    else if (d == "PixelFilter") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtPixelFilter(n, ps);
    } else if (d == "Film") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtFilm(n, ps);
    } else if (d == "Sampler") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtSampler(n, ps);
    } else if (d == "Accelerator") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtAccelerator(n, ps);
    } else if (d == "SurfaceIntegrator") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtSurfaceIntegrator(n, ps);
    } else if (d == "VolumeIntegrator") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtVolumeIntegrator(n, ps);
    } else if (d == "Camera") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtCamera(n, ps);
    } else if (d == "SearchPath") pbrtSearchPath(expect_str());
    else if (d == "WorldBegin") pbrtWorldBegin();
    else if (d == "WorldEnd") pbrtWorldEnd();
    else if (d == "AttributeBegin") pbrtAttributeBegin();
    else if (d == "AttributeEnd") pbrtAttributeEnd();
    else if (d == "TransformBegin") pbrtTransformBegin();
    else if (d == "TransformEnd") pbrtTransformEnd();
    else if (d == "ReverseOrientation") pbrtReverseOrientation();
    else if (d == "Texture") {
        string name = expect_str();
        string type = expect_str();
        string klass = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtTexture(name, type, klass, ps);
    } else if (d == "Material") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtMaterial(n, ps);
    } else if (d == "LightSource") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtLightSource(n, ps);
    } else if (d == "AreaLightSource") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtAreaLightSource(n, ps);
    } else if (d == "Shape") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtShape(n, ps);
    } else if (d == "Volume") {
        string n = expect_str();
        ParamSet ps;
        parse_params(ps);
        pbrtVolume(n, ps);
    } else if (d == "ObjectBegin") pbrtObjectBegin(expect_str());
    else if (d == "ObjectEnd") pbrtObjectEnd();
    else if (d == "ObjectInstance") pbrtObjectInstance(expect_str());
    else if (d == "Include") {
        string fn = expect_str();
        FILE *f = fopen(fn.c_str(), "r");
        if (!f) Error("Unable to open included file \"%s\"", fn.c_str());
        else {
            fstack.back().line = line_num;
            FileCtx fc;
            fc.f = f;
            fc.name = fn;
            fc.line = 1;
            fstack.push_back(fc);
            current_file = fn;
            line_num = 1;
        }
    } else {
        Error("Unknown directive \"%s\" (line %d of %s)", d.c_str(),
              line_num, current_file.c_str());
        ParamSet ps;
        parse_params(ps);  // consume defensively
    }
}

}  // namespace

int yyparse(void) {
    FileCtx fc;
    fc.f = yyin;
    fc.name = current_file;
    fc.line = 1;
    fstack.clear();
    fstack.push_back(fc);
    peeked = -2;
    have_pending = false;
    Tok t;
    while (next(&t)) {
        if (t.kind == Tok::ID) dispatch(t.s);
        else if (t.kind == Tok::END) break;
        else
            Error("Unexpected token at top level (line %d of %s)",
                  line_num, current_file.c_str());
    }
    // yyin's FILE is closed by the stack drain except the root, which
    // parser.cpp closes itself; guard double close by leaving it open.
    return 0;
}
