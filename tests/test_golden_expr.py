"""Golden expression conformance: RETURN <expr> through the engine, printed
with agtype_out, compared to the reference's regression outputs
(regress/sql/expr.sql — 955 pinned behaviors; this is the curated slice,
one case per semantic rule; sections cite the reference blocks they mirror).

Cases are evaluated in CHUNKS (one multi-column RETURN per chunk) so the
200+ cases cost ~15 Spark round-trips, not 200."""

import os

import pytest

from age_spark import AgeSession
from age_spark.runtime.agvalue import agtype_out

# (cypher RETURN payload, expected agtype_out string or None for SQL NULL)
CASES = [
    # ---- arithmetic & numeric types (expr.out arithmetic blocks)
    ("1 + 1", "2"),
    ("1 + 1.0", "2.0"),
    ("1 - 2", "-1"),
    ("2 * 3.0", "6.0"),
    ("7 / 2", "3"),
    ("-7 / 2", "-3"),  # int division truncates toward zero
    ("7.0 / 2", "3.5"),
    ("7 % 2", "1"),
    ("-5 % 3", "-2"),  # PG modulo keeps dividend sign
    ("5.5 % 2", "1.5"),
    ("2 ^ 10", "1024.0"),
    ("2 ^ 0.5", "1.4142135623731"),
    ("-(5)", "-5"),
    ("-(1.5)", "-1.5"),
    ("1 + 2 * 3", "7"),
    ("(1 + 2) * 3", "9"),
    ("(1 + 2) - (3)", "0"),
    # ---- null propagation through operators (expr.out:70 agtype_any_add)
    ("1 + null", None),
    ("null * 2", None),
    ("null + null", None),
    ("null - 1", None),
    ("null ^ 2", None),
    ("null % 3", None),
    # ---- comparisons / logic (three-valued; agtype_util.c ladder)
    ("1 < 2", "true"),
    ("1 = 1.0", "true"),
    ("1 <> 2", "true"),
    ("2 >= 2", "true"),
    ("2 > 2", "false"),
    ("'a' < 'b'", "true"),
    ("'abc' = 'abc'", "true"),
    ("null = null", None),
    ("null <> 1", None),
    ("NOT null", None),
    ("true OR null", "true"),
    ("false OR null", None),
    ("true AND null", None),
    ("false AND null", "false"),
    ("true AND false", "false"),
    ("true XOR true", "false"),
    ("true XOR false", "true"),
    ("NOT false", "true"),
    ("null IS NULL", "true"),
    ("1 IS NULL", "false"),
    ("null IS NOT NULL", "false"),
    ("[1, 2] = [1, 2]", "true"),
    ("[1, 2] = [2, 1]", "false"),
    # ---- IN operator (expr.out:366 "object of IN must be a list")
    ("3 IN [1, 2, 3]", "true"),
    ("4 IN [1, 2]", "false"),
    ("null IN [1, 2]", None),
    ("1 IN null", None),
    # ---- strings: 0-based offsets (agtype.c:9181 substring block)
    ("substring('hello', 1, 3)", '"ell"'),
    ("substring('hello', 0)", '"hello"'),
    ("substring('hello', 3)", '"lo"'),
    ("substring('hello', 0, 0)", '""'),
    ("substring('hello', 4, 10)", '"o"'),
    ("substring(null, 0)", None),
    ("left('hello', 2)", '"he"'),
    ("left('hello', 0)", '""'),
    ("left('hello', 99)", '"hello"'),
    ("left(null, 1)", None),  # expr.out:4589
    ("right('hello', 2)", '"lo"'),
    ("right('hello', 0)", '""'),
    ("right('hello', 99)", '"hello"'),
    ("right(null, 1)", None),
    ("toUpper('abc')", '"ABC"'),
    ("toLower('ABC')", '"abc"'),
    ("toUpper(null)", None),
    ("trim('  x  ')", '"x"'),
    ("lTrim('  x')", '"x"'),
    ("rTrim('x  ')", '"x"'),
    ("trim(null)", None),
    ("reverse('abc')", '"cba"'),
    ("reverse(null)", None),
    ("replace('aaa', 'a', 'b')", '"bbb"'),
    ("replace('hello', 'l', 'L')", '"heLLo"'),
    ("replace('aaa', 'aa', 'b')", '"ba"'),
    ("replace(null, 'a', 'b')", None),
    ("split('a,b,c', ',')", '["a", "b", "c"]'),
    ("split('one,two', ',')", '["one", "two"]'),
    ("split('abc', 'z')", '["abc"]'),
    ("split(null, ',')", None),
    ("'a' + 'b'", '"ab"'),
    # string + number concatenates (agtype_ops.c:179-190)
    ("'1' + 1", '"11"'),
    ("1 + 'a'", '"1a"'),
    ("'a' + 1.5", '"a1.5"'),
    ("size('hello')", "5"),
    ("size('')", "0"),
    ("size(null)", None),  # expr.out:3016
    ("'hello' STARTS WITH 'he'", "true"),
    ("'abc' STARTS WITH 'b'", "false"),
    ("null STARTS WITH 'a'", None),
    ("'abc' ENDS WITH 'bc'", "true"),
    ("'hello' CONTAINS 'ell'", "true"),
    ("'abc' CONTAINS null", None),
    ("'hello' =~ 'h.*'", "true"),
    ("'Hello' =~ 'hello'", "false"),
    ("'Hello' =~ '(?i)hello'", "true"),
    # ---- lists: access / out-of-bounds nulls (expr.out:373-416)
    ("range(0, 3)", "[0, 1, 2, 3]"),
    ("range(0, 6, 2)", "[0, 2, 4, 6]"),
    ("[1, 2, 3][1]", "2"),
    ("[1, 2, 3][-1]", "3"),
    ("[1, 2, 3][3]", None),
    ("[1, 2, 3][-4]", None),
    ("[][0]", None),
    ("[[1], [2]][0]", "[1]"),
    ("[[1, 2], [3]][0][1]", "2"),
    # ---- list slices: clamp semantics (expr.out:417-514)
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][0..]", "[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][..11]", "[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][0..0]", "[]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][10..10]", "[]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][0..1]", "[0]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][9..10]", "[9]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1..]", "[10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1..11]", "[10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-3..11]", "[8, 9, 10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1..10]", "[]"),
    ("[1, 2, 3, 4][1..3]", "[2, 3]"),
    ("[1, 2, 3][1..]", "[2, 3]"),
    ("[1, 2, 3][..2]", "[1, 2]"),
    ("[1, 2, 3][5..9]", "[]"),
    # ---- range(): step/empty/clamp (expr.out:7987-8047)
    ("range(0, 10, 3)", "[0, 3, 6, 9]"),
    ("range(0, -10, -3)", "[0, -3, -6, -9]"),
    ("range(0, -10, -1)", "[0, -1, -2, -3, -4, -5, -6, -7, -8, -9, -10]"),
    ("range(0, -10)", "[]"),
    ("range(0, 10, -1)", "[]"),
    ("range(-10, 10, -1)", "[]"),
    ("range(0, 10, 11)", "[0]"),
    ("range(-20, 10, 5)", "[-20, -15, -10, -5, 0, 5, 10]"),
    # ---- list fns (expr.out head/last/tail blocks)
    ("head([5, 6, 7])", "5"),
    ("head([])", None),
    ("head(null)", None),
    ("last([5, 6, 7])", "7"),
    ("last([])", None),
    ("tail([5, 6, 7])", "[6, 7]"),
    ("tail([1])", "[]"),
    ("tail([])", "[]"),
    ("tail([1, 2, 3, 4, 5])", "[2, 3, 4, 5]"),  # expr.out:8075
    ("size([1, 2, 3])", "3"),
    ("size([])", "0"),
    ("[1, 2] + [3]", "[1, 2, 3]"),
    ("[1, 2] + [3, 4]", "[1, 2, 3, 4]"),
    ("reverse([1, 2, 3])", "[3, 2, 1]"),
    ("reverse([])", "[]"),
    # ---- conversions (expr.out toInteger/toFloat blocks, 3440-3540)
    ("toInteger('1.2')", "1"),
    ("toInteger(1.2)", "1"),
    ("toInteger('not a number')", None),
    ("toInteger('42')", "42"),
    ("toInteger('')", None),
    ("toInteger(null)", None),
    ("toFloat('2.5')", "2.5"),
    ("toFloat(1)", "1.0"),
    ("toFloat('1')", "1.0"),
    ("toFloat('1.2')", "1.2"),
    ("toFloat('false_')", None),
    ("toFloat('')", None),
    ("toFloat(null)", None),
    ("toString(3)", '"3"'),
    ("toString(3.5)", '"3.5"'),
    ("toString(true)", '"true"'),
    ("toString(null)", None),
    ("toBoolean('true')", "true"),
    ("toBoolean('TRUE')", "true"),
    ("toBoolean('False')", "false"),
    ("toBoolean('nope')", None),
    ("toBoolean(null)", None),
    # ---- math (expr.out math fn blocks)
    ("abs(-3)", "3"),
    ("abs(-3.5)", "3.5"),
    ("abs(null)", None),
    ("sign(-3)", "-1"),  # age_sign returns INTEGER (expr.out:6010)
    ("sign(0)", "0"),
    ("sign(2)", "1"),
    ("floor(1.9)", "1.0"),
    ("floor(-1.1)", "-2.0"),
    ("ceil(1.1)", "2.0"),
    ("ceil(-1.1)", "-1.0"),
    ("round(1.45, 1)", "1.5"),
    ("round(2.5)", "3.0"),
    ("sqrt(16)", "4.0"),
    ("sqrt(2)", "1.4142135623731"),
    ("sqrt(null)", None),
    ("exp(0)", "1.0"),
    ("log(1)", "0.0"),
    ("log10(1000)", "3.0"),
    ("sin(0)", "0.0"),
    ("cos(0)", "1.0"),
    ("tan(0)", "0.0"),
    ("asin(0)", "0.0"),
    ("acos(1)", "0.0"),
    ("atan(0)", "0.0"),
    ("atan2(0, 1)", "0.0"),
    ("degrees(0)", "0.0"),
    ("radians(0)", "0.0"),
    ("pi()", "3.14159265358979"),
    ("e()", "2.71828182845905"),
    # ---- higher-order (expr.out reduce/list-comp blocks)
    ("reduce(a = 0, x IN [1, 2, 3] | a + x)", "6"),
    ("reduce(s = '', x IN ['a', 'b'] | s + x)", '"ab"'),
    ("reduce(a = 1, x IN [] | a + x)", "1"),
    ("[x IN [1, 2, 3, 4] WHERE x % 2 = 0 | x * 10]", "[20, 40]"),
    ("[x IN [1, 2, 3]]", "[1, 2, 3]"),
    ("[x IN range(0, 10) WHERE x % 2 = 0 | x ^ 2]", "[0.0, 4.0, 16.0, 36.0, 64.0, 100.0]"),
    ("all(x IN [1, 2] WHERE x > 0)", "true"),
    ("all(x IN [] WHERE x > 0)", "true"),
    ("any(x IN [] WHERE x > 0)", "false"),
    ("none(x IN [1, 2] WHERE x > 5)", "true"),
    ("none(x IN [] WHERE x > 0)", "true"),
    ("single(x IN [1, 2, 3] WHERE x = 2)", "true"),
    ("single(x IN [] WHERE x > 0)", "false"),
    # ---- case / coalesce
    ("CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END", '"y"'),
    ("CASE WHEN false THEN 1 END", None),
    ("CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END", '"b"'),
    ("CASE 9 WHEN 1 THEN 'a' END", None),
    ("coalesce(null, null, 9)", "9"),
    ("coalesce(null)", None),
    ("coalesce(null, 'x')", '"x"'),
    # ---- maps
    ("{a: 1, b: 'x'}.a", "1"),
    ("{a: {b: 2}}.a.b", "2"),
    ("{a: 1, b: 'x'}['b']", '"x"'),
    ("{a: [1, 2]}.a[1]", "2"),
    ("keys({a: 1, b: 2})", '["a", "b"]'),
    ("{z: 1, a: 2}", '{"a": 2, "z": 1}'),  # JSONB key order on print
    # ---- predicates on values
    ("exists(null)", "false"),
    ("exists(3)", "true"),
    ("isEmpty([])", "true"),
    ("isEmpty([1])", "false"),
    ("isEmpty('')", "true"),
    ("isEmpty('x')", "false"),
    # ---- jsonb bridge
    ("toJson([1, 2, 3])", '"[1,2,3]"'),
    ("toJson({a: 1})", '"{\\"a\\":1}"'),
    ("fromJson('[1,2,3]', 'array<bigint>')", "[1, 2, 3]"),
    # ---- float print / literals (PG float8out conventions)
    ("0.1 + 0.2", "0.3"),
    ("1e3", "1000.0"),
    ("1.5e-2", "0.015"),
    ("9007199254740993", "9007199254740993"),  # > 2^53: stays exact int64
    ("-(2 ^ 2)", "-4.0"),
    ("2 ^ -1", "0.5"),
    ("10 % 0.0", "NaN"),  # float modulo-by-zero (PG float8)
    ("round(-1.5)", "-2.0"),  # half away from zero
    ("abs(-0.0)", "0.0"),
    # ---- string escapes / unicode (jsonb_out conventions)
    ("'a\\\"b'", '"a\\"b"'),
    ("'héllo'", '"héllo"'),
    # ---- list conversions (expr.out toFloatList block, 3510-3540)
    ("toIntegerList(['1', '2.9'])", "[1, 2]"),
    ("toFloatList([1.2, '4.654'])", "[1.2, 4.654]"),
    ("toFloatList(['1.9432', 8.6222])", "[1.9432, 8.6222]"),
    ("toBooleanList(['true', 'no'])", "[true, null]"),
    ("toStringList([1, 2.5, true])", '["1", "2.5", null]'),  # bools -> null (expr.out:3936)
    # ---- list comparisons (element-wise ladder)
    ("[] = []", "true"),
    ("[1] < [2]", "true"),
    ("[1, 2] < [2]", "true"),
    ("{a: 1} = {a: 1}", "true"),
    # ---- heterogeneous literal lists (dynamic agtype, agtype.h:307)
    ("[1, 'a', true]", '[1, "a", true]'),
    ("[1, 'a', null]", '[1, "a", null]'),
    ("[1, 'a', true][1]", '"a"'),
    ("size([1, 'a', true])", "3"),
    ("'a' IN [1, 'a']", "true"),
    ("2 IN [1, 'a']", "false"),
    ("toStringList([1, 'a', true])", '["1", "a", null]'),  # bools -> null (expr.out:3936)
    # ---- boolean conversions of numbers (expr.out:3335)
    ("toBoolean(1)", "true"),
    ("toBoolean(0)", "false"),
    # ================= round-3 expansion =================
    # Mined verbatim from regress/expected/expr.out + agtype.out single-value
    # RETURN blocks (reference-derived expected strings; see /tmp extraction
    # provenance in the commit message). Sections: containers & slicing,
    # string+number concat, chained comparisons, string predicates, casts,
    # list conversions, math, entity casts, null-strict fns.
    ("{}", "{}"),
    ("{s: 's', i: 1, f: 1.0, b: true, z: null}", "{\"b\": true, \"f\": 1.0, \"i\": 1, \"s\": \"s\", \"z\": null}"),
    ("{s: {s: 's'}, t: {i: 1, e: {f: 1.0}, s: {a: {b: true}}}, z: null}", "{\"s\": {\"s\": \"s\"}, \"t\": {\"e\": {\"f\": 1.0}, \"i\": 1, \"s\": {\"a\": {\"b\": true}}}, \"z\": null}"),
    ("[]", "[]"),
    ("['str', 1, 1.0, true, null]", "[\"str\", 1, 1.0, true, null]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][5]", "5"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][10]", "10"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1]", "10"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-3]", "8"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][11]", None),
    ("'str' + 1", "\"str1\""),
    ("'str' + 1.0", "\"str1.0\""),
    ("1 + 'str'", "\"1str\""),
    ("1.0 + 'str'", "\"1.0str\""),
    ("(-(3 * 2 - 4.0) ^ ((10 / 5) + 1)) % -3", "-2.0"),
    ("1 = 1 = 1", "true"),
    ("1 = 2 = 1", "false"),
    ("(1 = 1) = 1", "false"),
    ("1 = (1 = 1)", "false"),
    ("1 = 1 = true", "false"),
    ("(1 = 1) = true", "true"),
    ("true = ((1 = 1) = true)", "true"),
    ("((1 = 1) = 1) = 1", "false"),
    ("(1 = (1 = 1)) = 1", "false"),
    ("((1 = (1 = 1)) = 1) = 1", "false"),
    ("\"abcdefghijklmnopqrstuvwxyz\" STARTS WITH \"abcd\"", "true"),
    ("\"abcdefghijklmnopqrstuvwxyz\" ENDS WITH \"wxyz\"", "true"),
    ("\"abcdefghijklmnopqrstuvwxyz\" CONTAINS \"klmn\"", "true"),
    ("\"abcdefghijklmnopqrstuvwxyz\" STARTS WITH \"bcde\"", "false"),
    ("\"abcdefghijklmnopqrstuvwxyz\" ENDS WITH \"vwxy\"", "false"),
    ("\"abcdefghijklmnopqrstuvwxyz\" CONTAINS \"klmo\"", "false"),
    ("\"abcdefghijklmnopqrstuvwxyz\" STARTS WITH NULL", None),
    ("\"abcdefghijklmnopqrstuvwxyz\" ENDS WITH NULL", None),
    ("\"abcdefghijklmnopqrstuvwxyz\" CONTAINS NULL", None),
    ("0.0::integer", "0"),
    ("'0'::int", "0"),
    ("'0'::integer", "0"),
    ("0.0::numeric::int", "0"),
    ("2.71::int", "3"),
    ("2.71::numeric::int", "3"),
    ("true::int", "1"),
    ("false::int", "0"),
    ("([0, {one: 1, pie: 3.1415927, e: 2.718281::numeric}, 2, null][3])::int", None),
    ("null::int", None),
    ("'2.71'::numeric", "2.71::numeric"),
    ("(2.71::numeric)::numeric", "2.71::numeric"),
    ("('2.71'::numeric)::numeric", "2.71::numeric"),
    ("null::numeric", None),
    ("0::float", "0.0"),
    ("'2.71'::float", "2.71"),
    ("2.71::float", "2.71"),
    ("'NaN'::float", "NaN"),
    ("'inf'::float", "Infinity"),
    ("'-inf'::float", "-Infinity"),
    ("'infinity'::float", "Infinity"),
    ("'-infinity'::float", "-Infinity"),
    ("null::float", None),
    ("0::pg_float8", "0.0"),
    ("'2.71'::pg_float8", "2.71"),
    ("2.71::pg_float8", "2.71"),
    ("'NaN'::pg_float8", "NaN"),
    ("'inf'::pg_float8", "Infinity"),
    ("'-inf'::pg_float8", "-Infinity"),
    ("'infinity'::pg_float8", "Infinity"),
    ("'-infinity'::pg_float8", "-Infinity"),
    ("null::pg_float8", None),
    ("{vertex_0:{id:0, label:\"vertex 0\", properties:{}}::vertex}", "{\"vertex_0\": {\"id\": 0, \"label\": \"vertex 0\", \"properties\": {}}::vertex}"),
    ("{id:3, label:\"edge 0\", properties:{}, start_id:0, end_id:1}::edge", "{\"id\": 3, \"label\": \"edge 0\", \"end_id\": 1, \"start_id\": 0, \"properties\": {}}::edge"),
    ("NULL::vertex", None),
    ("NULL::edge", None),
    ("label(NULL)", None),
    ("size(\"1234567890\")", "10"),
    ("size([1, 2, 3, 4, 5])", "5"),
    ("head([1])", "1"),
    ("head([null, null])", None),
    ("last([1])", "1"),
    ("last(null)", None),
    ("last([null, null])", None),
    ("coalesce(null, -3.14, null, null)", "-3.14"),
    ("coalesce(null, \"string\", null, null)", "\"string\""),
    ("coalesce(null, null, null, [])", "[]"),
    ("coalesce(null, null, null, {})", "{}"),
    ("coalesce(null, id(null), null)", None),
    ("toBoolean(false)", "false"),
    ("toBoolean(\"true\")", "true"),
    ("toBoolean(\"false\")", "false"),
    ("toBoolean(\"false_\")", None),
    ("toBooleanList([\"true\", \"false\", \"true\"])", "[true, false, true]"),
    ("toBooleanList([\"True\", \"False\", \"True\"])", "[true, false, true]"),
    ("toBooleanList([0,1,2,3,4])", "[false, true, true, true, true]"),
    ("toBooleanList([])", None),
    ("toBooleanList([null, null, null])", "[null, null, null]"),
    ("toBooleanList([\"Hello\", \"world!\"])", "[null, null]"),
    ("toBooleanList([[\"A\", \"B\"], [\"C\", \"D\"]])", "[null, null]"),
    ("toFloat(1.2)", "1.2"),
    ("toFloat(\"1\")", "1.0"),
    ("toFloat(\"1.2\")", "1.2"),
    ("toFloat(\"1.2\"::numeric)", "1.2"),
    ("toFloat(\"false_\")", None),
    ("toFloatList(['1.9432', 8.6222, '9.4111212', 344.22])", "[1.9432, 8.6222, 9.4111212, 344.22]"),
    ("toFloatList(['999.2'])", "[999.2]"),
    ("toFloatList([1.20002])", "[1.20002]"),
    ("toFloatList([1.0e308, -1.0e308])", "[1e+308, -1e+308]"),
    ("toFloatList([0.123456789])", "[0.123456789]"),
    ("toFloatList(['true'])", "[null]"),
    ("toFloatList([null])", "[null]"),
    ("toInteger(\"1\")", "1"),
    ("toInteger(\"1.2\")", "1"),
    ("toInteger(\"1.2\"::numeric)", "1"),
    ("toInteger(\"false_\")", None),
    ("toIntegerList([4.2, '123', '8', 8])", "[4, 123, 8, 8]"),
    ("toIntegerList(['41', '12', 2])", "[41, 12, 2]"),
    ("toIntegerList([1, 2, 3, '10.2'])", "[1, 2, 3, 10]"),
    ("toIntegerList([0000])", "[0]"),
    ("toIntegerList([\"false_\", 'asdsad', '123k1kdk1'])", "[null, null, null]"),
    ("toIntegerList([null, '123false', 'one'])", "[null, null, null]"),
    ("length(null)", None),
    ("toStringList(['test', 89, 'again', 7.1, 9])", "[\"test\", \"89\", \"again\", \"7.1\", \"9\"]"),
    ("toStringList([null, false, true, 'string'])", "[null, null, null, \"string\"]"),
    ("toStringList([9.123456789, 5.123, 1.12345, 0.123123])", "[\"9.123456789\", \"5.123\", \"1.12345\", \"0.123123\"]"),
    ("toStringList([null])", "[null]"),
    ("toStringList([true, false, true, true])", "[null, null, null, null]"),
    ("reverse('')", "\"\""),
    ("reverse(\"\")", "\"\""),
    ("reverse([4923, 'abc', 521, NULL, 487])", "[487, null, 521, \"abc\", 4923]"),
    ("reverse([4923])", "[4923]"),
    ("toLower('TO LOWERCASE')", "\"to lowercase\""),
    ("toupper('')", "\"\""),
    ("toupper(\"\")", "\"\""),
    ("tolower('')", "\"\""),
    ("tolower(\"\")", "\"\""),
    ("toLower(null)", None),
    ("rTrim(\"  string   \")", "\"  string\""),
    ("trim(\"  string   \")", "\"string\""),
    ("lTrim('')", "\"\""),
    ("rTrim('')", "\"\""),
    ("trim('')", "\"\""),
    ("lTrim(\"\")", "\"\""),
    ("rTrim(\"\")", "\"\""),
    ("trim(\"\")", "\"\""),
    ("lTrim(null)", None),
    ("rTrim(null)", None),
    ("left(\"123456789\", 3)", "\"123\""),
    ("left(\"123456789\", 0)", "\"\""),
    ("left(null, null)", None),
    ("right(\"123456789\", 3)", "\"789\""),
    ("right(\"123456789\", 0)", "\"\""),
    ("right(null, null)", None),
    ("substring(\"0123456789\", 1, 3)", "\"123\""),
    ("substring(\"0123456789\", 3)", "\"3456789\""),
    ("substring(\"0123456789\", 0)", "\"0123456789\""),
    ("substring(null, null, null)", None),
    ("substring(null, null)", None),
    ("substring(null, 1)", None),
    ("split(\"a,b,c,d,e,f\", \"\")", "[\"a\", \",\", \"b\", \",\", \"c\", \",\", \"d\", \",\", \"e\", \",\", \"f\"]"),
    ("split(\"a,b,c,d,e,f\", \" \")", "[\"a,b,c,d,e,f\"]"),
    ("split(\"a,b,cd  e,f\", \" \")", "[\"a,b,cd\", \"\", \"e,f\"]"),
    ("split(\"a,b,cd  e,f\", \"  \")", "[\"a,b,cd\", \"e,f\"]"),
    ("split(\"a,b,c,d,e,f\", \"c,\")", "[\"a,b,\", \"d,e,f\"]"),
    ("split(null, null)", None),
    ("split(\"a,b,c,d,e,f\", null)", None),
    ("split(null, \",\")", None),
    ("replace(\"Hello\", \"hello\", \"Good bye\")", "\"Hello\""),
    ("replace(\"abcabcabc\", \"abc\", \"a\")", "\"aaa\""),
    ("replace(\"abcabcabc\", \"ab\", \"\")", "\"ccc\""),
    ("replace(\"ababab\", \"ab\", \"ab\")", "\"ababab\""),
    ("replace(\"\", \"\", \"\")", "\"\""),
    ("replace(\"Hello\", \"Hello\", \"\")", "\"\""),
    ("replace(\"\", \"Hello\", \"Mellow\")", "\"\""),
    ("replace(null, null, null)", None),
    ("replace(\"Hello\", null, null)", None),
    ("replace(\"Hello\", \"\", null)", None),
    ("cos(null)", None),
    ("tan(null)", None),
    ("cot(null)", None),
    ("asin(1.1)", None),
    ("acos(1.1)", None),
    ("asin(-1.1)", None),
    ("acos(-1.1)", None),
    ("asin(null)", None),
    ("acos(null)", None),
    ("atan(null)", None),
    ("atan2(null, null)", None),
    ("atan2(null, 1)", None),
    ("atan2(1, null)", None),
    ("cos(pi())", "-1.0"),
    ("sin(pi()/2)", "1.0"),
    ("radians(null)", None),
    ("degrees(null)", None),
    ("abs(10)", "10"),
    ("abs(-10)", "10"),
    ("ceil(0)", "0.0"),
    ("ceil(1)", "1.0"),
    ("ceil(-1)", "-1.0"),
    ("ceil(1.01)", "2.0"),
    ("ceil(-1.01)", "-1.0"),
    ("floor(0)", "0.0"),
    ("floor(1)", "1.0"),
    ("floor(-1)", "-1.0"),
    ("floor(1.01)", "1.0"),
    ("floor(-1.01)", "-2.0"),
    ("round(0)", "0.0"),
    ("round(4.49999999)", "4.0"),
    ("round(4.5)", "5.0"),
    ("round(-4.49999999)", "-4.0"),
    ("round(-4.5)", "-5.0"),
    ("round(7.4163, 3)", "7.416"),
    ("round(7.416343479, 8)", "7.41634348"),
    ("round(7.416343479, NULL)", "7.0"),
    ("round(NULL, 7)", None),
    ("round(7, 2)", "7.0"),
    ("round(7.4342, 2.1123)", "7.43"),
    ("round(NULL, NULL)", None),
    ("sign(10)", "1"),
    ("sign(-10)", "-1"),
    ("ceil(null)", None),
    ("floor(null)", None),
    ("round(null)", None),
    ("sign(null)", None),
    ("avg(NULL)", None),
    ("sum(NULL)", None),
    ("count(NULL)", "0"),
    ("max(NULL)", None),
    ("stDevP(NULL)", "0.0"),
    ("percentileCont(NULL, .5)", None),
    ("percentileDisc(NULL, .5)", None),
    ("collect(5)", "[5]"),
    ("collect(NULL)", "[]"),
    ("\"1.0\"::pg_float8", "1.0"),
    ("keys({a:1,b:'two',c:[1,2,3]})", "[\"a\", \"b\", \"c\"]"),
    ("keys({})", "[]"),
    ("keys(null)", None),
    ("tail([\"a\",\"b\",\"c\",\"d\",\"e\"])", "[\"b\", \"c\", \"d\", \"e\"]"),
    ("{a: null}", "{\"a\": null}"),
    ("{companyName: null, sinceYear: null}", "{\"sinceYear\": null, \"companyName\": null}"),
    ("coalesce({a: null}, null)", "{\"a\": null}"),
    ("{outer: {inner: null, kept: 1}}", "{\"outer\": {\"kept\": 1, \"inner\": null}}"),
    ("{a: 1, b: null, c: 'x'}", "{\"a\": 1, \"b\": null, \"c\": \"x\"}"),
    # ---- access into dynamic containers (agtype_access_operator,
    # agtype.c:4482 — variant-backed navigation of tagged object/array rows)
    ("[0, {one: 1.0, pie: 3.1415927, e: 2.718281}, 2, null][1].one", "1.0"),
    ("[0, {one: 1}, 2, null][1].one", "1"),
    ("([0, {one: 1}, 2, null][1].one)::float", "1.0"),
    ("([0, {one: 1.0}, 2, null][1].one)::int", "1"),
    ("[0, {one: 1}, 2, null][1].missing", None),
    ("[0, {l: [1, 2]}, 'x'][1].l", "[1, 2]"),
    ("[0, {l: [1, 2]}, 'x'][1].l[1]", "2"),
    ("[0, {b: true}, 'x'][1].b", "true"),
    ("[0, {s: 'hi'}, 'x'][1].s", '"hi"'),
    ("[[9, 8], 'x'][0][1]", "8"),
    ("[0, {one: 1}, 2, null][3].one", None),
    # float prints where expr.sql pins %.15g via `SET extra_float_digits = 0`
    # (expr.sql:20): the VALUES are identical; we pin the PG-default
    # (extra_float_digits=1) shortest-exact print of the same float8
    ("acos(0)*2", "3.14159265358979"),
    ("atan(1)*4", "3.14159265358979"),
    ("atan2(1, 1)*4", "3.14159265358979"),
    ("sin(pi())", "1.22464679914735e-16"),
    ("sin(pi()/4)", "0.707106781186547"),
    ("cos(pi()/2)", "6.12323399573677e-17"),
    # ---- round-3 expansion, batch 2: mined from predicate_functions/
    # list_comprehension/age_reduce/reserved_keyword_alias/jsonb_operators/
    # scan expected outputs (3-valued predicates, || concat, reduce
    # edge cases, SQL-style quote escapes)
    ("[u IN range(1, 30, 2)]", "[1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27, 29]"),
    ("[u IN range(1, 30, 2)][2]", "5"),
    ("[u IN range(1, 30, 2)][1..4]", "[3, 5, 7]"),
    ("[u IN range(1, 30, 2) WHERE u % 3 = 0]", "[3, 9, 15, 21, 27]"),
    ("[u IN range(1, 30, 2) WHERE u % 3 = 0][2]", "15"),
    ("[u IN range(1, 30, 2) WHERE u % 3 = 0][0..4]", "[3, 9, 15, 21]"),
    ("[u IN range(1, 30, 2) WHERE u % 3 = 0 | u^2 ]", "[9.0, 81.0, 225.0, 441.0, 729.0]"),
    ("[u IN range(1, 30, 2) WHERE u % 3 = 0 | u^2 ][3]", "441.0"),
    ("[u IN range(1, 30, 2) WHERE u % 3 = 0 | u^2 ][1..5]", "[81.0, 225.0, 441.0, 729.0]"),
    ("[u IN range(1, 30, 2) | u^2 ]", "[1.0, 9.0, 25.0, 49.0, 81.0, 121.0, 169.0, 225.0, 289.0, 361.0, 441.0, 529.0, 625.0, 729.0, 841.0]"),
    ("[u IN range(1, 30, 2) | u^2 ][0]", "1.0"),
    ("[u IN range(1, 30, 2) | u^2 ][0..2]", "[1.0, 9.0]"),
    ("[i IN [i IN [1,2,3]]]", "[1, 2, 3]"),
    ("[i IN [i IN [i IN [1,2,3]]]]", "[1, 2, 3]"),
    ("[i IN [i IN [1,2,3] WHERE i>1]]", "[2, 3]"),
    ("[i IN [i IN [1,2,3]] WHERE i>1]", "[2, 3]"),
    ("[i IN [i IN [1,2,3] WHERE i>1] WHERE i>2]", "[3]"),
    ("[i IN [i IN [1,2,3] WHERE i>1 | i^2]]", "[4.0, 9.0]"),
    ("[i IN [i IN [1,2,3]] WHERE i>1 | i^2]", "[4.0, 9.0]"),
    ("[i IN [i IN [1,2,3] WHERE i>1] WHERE i>2 | i^2]", "[9.0]"),
    ("[i IN [i IN [1,2,3] WHERE i>1 | i^2] WHERE i>4]", "[9.0]"),
    ("[i IN [i IN [1,2,3] WHERE i>1 | i^2] WHERE i>4 | i^2]", "[81.0]"),
    ("[x IN [{name:'a'}, {name:'b'}] | x.name]", "[\"a\", \"b\"]"),
    ("[x IN [{n:1}, {n:2}, {n:3}] WHERE x.n > 1 | x.n]", "[2, 3]"),
    ("[x IN [null] | x + 1]", "[null]"),
    ("[x IN [1, null, 2] | x + 1]", "[2, null, 3]"),
    ("[x IN [1, null, 2] | 1 + x]", "[2, null, 3]"),
    ("[x IN [1, null, 2] | x]", "[1, null, 2]"),
    ("[x IN [1, null, 2] | x - 1]", "[0, null, 1]"),
    ("[x IN [1, null, 2] | x * 2]", "[2, null, 4]"),
    ("[x IN [1, null, 2] | x / 1]", "[1, null, 2]"),
    ("[x IN [1, null, 2] | x % 2]", "[1, null, 0]"),
    ("[x IN [1, null, 2] | x ^ 2]", "[1.0, null, 4.0]"),
    ("[x IN [1, null, 2] | -x]", "[-1, null, -2]"),
    ("[x IN [null, 1] WHERE x IS NULL]", "[null]"),
    ("[x IN [null, 1, null] WHERE x IS NULL]", "[null, null]"),
    ("[x IN [null, 1] WHERE x IS NOT NULL]", "[1]"),
    ("[x IN [1, 2, 3] WHERE x IS NULL]", "[]"),
    ("(1 + 2)", "3"),
    ("[1,2] || 2", "[1, 2, 2]"),
    ("true || false", "[true, false]"),
    ("true || false || {a: 'string'}", "[true, false, {\"a\": \"string\"}]"),
    ("true || false || {a: 'string'} || true", "[true, false, {\"a\": \"string\"}, true]"),
    ("reduce(s = 0, x IN [1, 2, 3] | s + x)", "6"),
    ("reduce(s = 0, x IN [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] | s + x)", "55"),
    ("reduce(p = 1, x IN [1, 2, 3, 4, 5] | p * x)", "120"),
    ("reduce(s = 100, x IN [1, 2, 3] | s + x)", "106"),
    ("reduce(s = 0, x IN [42] | s + x)", "42"),
    ("reduce(s = 0, x IN [1, 2, 3, 4] | s - x)", "-10"),
    ("reduce(s = '', x IN ['a', 'b', 'c'] | s + x)", "\"abc\""),
    ("reduce(s = '', x IN ['a', 'b', 'c'] | x + s)", "\"cba\""),
    ("reduce(s = 0, x IN [] | s + x)", "0"),
    ("reduce(s = 999, x IN [] | s + x)", "999"),
    ("reduce(s = 0, x IN null | s + x)", None),
    ("reduce(s = null, x IN [] | s + x)", None),
    ("reduce(s = 0.0, x IN [1.5, 2.5, 3.0] | s + x)", "7.0"),
    ("reduce(s = 0, x IN [-1, -2, -3] | s + x)", "-6"),
    ("reduce(s = {n: 0}, x IN [1, 2, 3] | s)", "{\"n\": 0}"),
    ("reduce(s = 0, x IN [[1, 2], [3, 4], [5, 6]] | s + x[0])", "9"),
    ("reduce(s = 0, x IN ['a', 'bb', 'ccc'] | s + size(x))", "6"),
    ("reduce(s = 0, x IN range(1, 5) | s + x)", "15"),
    ("size(reduce(s = [], x IN [1, 2, 3, 4] | s + [x]))", "4"),
    ("reduce(s = 0, x IN [1, 2, 3] | s + x) = 6", "true"),
    ("reduce(s = true, x IN [true, true, false] | s AND x)", "false"),
    ("reduce(s = false, x IN [false, true, false] | s OR x)", "true"),
    ("reduce(s = false, x IN [1, 2, 3] | x = 2)", "false"),
    ("reduce(found = false, x IN [1, 2, 3] | found OR x = 2)", "true"),
    ("reduce(s = true, x IN [1, 2, 3] | s AND x > 0)", "true"),
    ("reduce(s = true, x IN [1, -2, 3] | s AND x > 0)", "false"),
    ("reduce(s = 0, x IN [{n: 1}, {n: 2}, {n: 3}] | s + x.n)", "6"),
    ("reduce(s = '', x IN [{w: 'a'}, {w: 'b'}, {w: 'c'}] | s + x.w)", "\"abc\""),
    ("reduce(s = 0, x IN [1, 2, 3] | s + x) + reduce(p = 1, y IN [2, 3] | p * y)", "12"),
    ("reduce(s = 0, x IN [reduce(a = 0, y IN [1, 2, 3] | a + y), 10] | s + x)", "16"),
    ("reduce(s = reduce(a = 0, y IN [1, 2, 3] | a + y), x IN [10, 20] | s + x)", "36"),
    ("[v IN [1, 2, 3] | reduce(s = 0, x IN [v, v, v] | s + x)]", "[3, 6, 9]"),
    ("1", "1"),
    ("'''hello'", "\"'hello\""),
    ("'hello'''", "\"hello'\""),
    ("'it''s a ''test'''", "\"it's a 'test'\""),
    ("\"she said \"\"hello\"\"\"", "\"she said \\\"hello\\\"\""),
    ("all(x IN [1, 2, 3] WHERE x > 0)", "true"),
    ("all(x IN [1, 2, 3] WHERE x > 1)", "false"),
    ("any(x IN [1, 2, 3] WHERE x > 2)", "true"),
    ("any(x IN [1, 2, 3] WHERE x > 5)", "false"),
    ("none(x IN [1, 2, 3] WHERE x > 5)", "true"),
    ("none(x IN [1, 2, 3] WHERE x > 2)", "false"),
    ("single(x IN [1, 2, 3] WHERE x > 2)", "true"),
    ("single(x IN [1, 2, 3] WHERE x > 1)", "false"),
    ("single(x IN [1, 2, 3] WHERE x > 5)", "false"),
    ("all(x IN null WHERE x > 0)", None),
    ("any(x IN null WHERE x > 0)", None),
    ("none(x IN null WHERE x > 0)", None),
    ("single(x IN null WHERE x > 0)", None),
    ("any(x IN [null] WHERE x > 0)", None),
    ("any(x IN [null, 1, 2] WHERE x > 0)", "true"),
    ("all(x IN [1] WHERE null)", None),
    ("all(x IN [1, null, 2] WHERE x > 0)", None),
    ("all(x IN [1, null, -1] WHERE x > 0)", "false"),
    ("none(x IN [null] WHERE x > 0)", None),
    ("none(x IN [null, 5] WHERE x > 0)", "false"),
    ("single(x IN [null, 5] WHERE x > 0)", None),
    ("single(x IN [null, 5, 6] WHERE x > 0)", "false"),
    ("single(x IN [null, null] WHERE x > 0)", None),
    ("single(x IN [1, null, -1] WHERE x > 0)", None),
    ("any(x IN [null, -1] WHERE x > 0)", None),
    ("all(x IN [1, null] WHERE x > 0)", None),
    ("all(x IN [null, -1] WHERE x > 0)", "false"),
    ("none(x IN [null, -1] WHERE x > 0)", None),
    ("any(x IN [1, null] WHERE x IS NULL)", "true"),
    ("none(x IN [1, null] WHERE x IS NULL)", "false"),
    ("all(x IN [null, null] WHERE x IS NULL)", "true"),
    ("any(x IN [{n: 1}, {n: 2}] WHERE x.n > 1)", "true"),
    ("any(x IN [{n: 1}, {n: 2}] WHERE x.n > 5)", "false"),
    ("all(x IN [{n: 1}, {n: 2}] WHERE x.n > 0)", "true"),
    ("all(x IN [{n: 1}, {n: 2}] WHERE x.n > 1)", "false"),
    ("none(x IN [{n: 1}, {n: 2}] WHERE x.n > 2)", "true"),
    ("none(x IN [{n: 1}, {n: 2}] WHERE x.n = 1)", "false"),
    ("single(x IN [{n: 1}, {n: 2}] WHERE x.n = 1)", "true"),
    ("single(x IN [{n: 1}, {n: 2}] WHERE x.n > 0)", "false"),
    ("any(x IN [1, 2, 3] WHERE all(y IN [1, 2] WHERE y < x))", "true"),
    ("{any: 1, none: 2, single: 3}", "{\"any\": 1, \"none\": 2, \"single\": 3}"),
    # ---- || concat + #> path extraction (agtype_ops.c:1761,2024;
    # regress/sql/jsonb_operators.sql concat and #> blocks)
    ("[1,2] || 2", "[1, 2, 2]"),
    ("true || false", "[true, false]"),
    ("true || false || {a: 'string'}", '[true, false, {"a": "string"}]'),
    ("{a: 1} || {b: 2}", '{"a": 1, "b": 2}'),
    ("{a: 1} || {a: 9}", '{"a": 9}'),
    ("[1,2,3] || 'string'", '[1, 2, 3, "string"]'),
    ("[[-3, 1]] #> []", "[[-3, 1]]"),
    ("[[-3, 1]] #> [0]", "[-3, 1]"),
    ("[[-3, 1]] #> [-1, -1]", "1"),
    ("[[-3, 1]] #> [-1, -1, -1]", None),
    ("[[-3, 1]] #> [{}]", None),
    ("[null] #> []", "[null]"),
    ("[] #> []", "[]"),
    ("[] #> ['a', 1]", None),
    ("{a: {b: [1, 2]}} #> ['a', 'b', 1]", "2"),
    ('{a: {b: [1, 2]}} #>> [\'a\', \'b\', 1]', '"2"'),
    # ---- agtype_in/out round trips (regress/sql/agtype.sql; prints from
    # agtype.out:68-98): int64 bounds, float digit fidelity, NaN/Infinity
    # spellings, numeric literals keeping exact source digits
    ("9223372036854775807", "9223372036854775807"),
    ("-9223372036854775808", "-9223372036854775808"),
    ("100000000.000001", "100000000.000001"),
    ("-100000000.000001", "-100000000.000001"),
    ("1.2345e-16", "1.2345e-16"),
    ("-1.2345e-16", "-1.2345e-16"),
    ("100000000000.0000000000001::numeric", "100000000000.0000000000001::numeric"),
    ("-100000000000.0000000000001::numeric", "-100000000000.0000000000001::numeric"),
    ("[-9223372036854775808, -1, 0, 1, 9223372036854775807]",
     "[-9223372036854775808, -1, 0, 1, 9223372036854775807]"),
    ("toFloat('NaN')", "NaN"),
    ("toFloat('Infinity')", "Infinity"),
    ("toFloat('-Infinity')", "-Infinity"),
    ("toFloat('inf')", "Infinity"),
    ("toFloat('-inf')", "-Infinity"),
    # ---- orderability (agtype.sql:448-560): NaN is the biggest numeric —
    # greater than +Infinity, and NaN = NaN under ordering; mixed-kind
    # numeric comparisons are by value
    ("1.01 < toFloat('NaN')", "true"),
    ("toFloat('NaN') > toFloat('Infinity')", "true"),
    ("toFloat('NaN') > toFloat('-Infinity')", "true"),
    ("toFloat('NaN') = toFloat('NaN')", "true"),
    ("1 < toFloat('NaN')", "true"),
    ("1 < toFloat('Infinity')", "true"),
    ("1 > toFloat('-Infinity')", "true"),
    ("1 = 1::numeric", "true"),
    ("1 < 2::numeric", "true"),
    ("1.01 = 1.01::numeric", "true"),
    ("1.01 < 1.011::numeric", "true"),
    ("1.01 >= 1.001::numeric", "true"),
    ("'a' < 'aa'", "true"),
    ("'b' > 'aa'", "true"),
    # lists/objects: element-/pair-wise, premature end sorts first
    # (compare_agtype_containers_orderability, agtype_util.c:333)
    ("[0, 1, null, 2] = [0, 1, null, 2]", "true"),
    ("[0, 1, null] < [0, 1, null, 2]", "true"),
    ("[1, 1, null, 2] > [0, 1, null, 2]", "true"),
    ("[1, 'string'] < [1, 1]", "true"),
    ("{bool: true, null: null} = {null: null, bool: true}", "true"),
    ("{bool: true, integer: 1} = {integer: 1, bool: true}", "true"),
    ("{a: {b: 1, c: 2}} = {a: {c: 2, b: 1}}", "true"),
    ("{a: 1} < {a: 2}", "true"),
    ("{a: 1} < {b: 1}", "true"),
    ("{bool: true, i: 0} < {bool: true, i: 0, x: 1}", "true"),
    # cross-KIND comparisons decided by the ladder (agtype.sql:531-556):
    # Object < List < String < Boolean < Numeric
    ("'string' < true", "true"),
    ("[1,3,5,7,9,11] < 'string'", "true"),
    ("{bool: true, integer: 1} < [1,3,5,7,9,11]", "true"),
    ("true < 1", "true"),
    ("true < toFloat('NaN')", "true"),
    ("true < toFloat('Infinity')", "true"),
    ("true < 1::numeric", "true"),
    # the mixed-array round trip (agtype.out:90; its -1::numeric element is
    # covered separately — inside a het list the NUMERIC kind collapses to
    # float, the documented DECIMAL-slot bound)
    ("[true, false, null, 'string', 1, 1.0, {bool: true}, [1,3,5]]",
     '[true, false, null, "string", 1, 1.0, {"bool": true}, [1, 3, 5]]'),
]


@pytest.fixture(scope="module")
def empty_graph(spark):
    age = AgeSession(spark)
    return age, age.create_graph("expr")


CHUNK = 15
_CHUNKS = [CASES[i : i + CHUNK] for i in range(0, len(CASES), CHUNK)]


def _run_chunk(empty_graph, chunk):
    age, g = empty_graph
    payload = ", ".join(f"{expr} AS c{i}" for i, (expr, _) in enumerate(chunk))
    row = age.cypher(g, f"RETURN {payload}").df.collect()[0]
    bad = []
    for i, (expr, expected) in enumerate(chunk):
        got = agtype_out(row[f"c{i}"])
        if got != expected:
            bad.append(f"{expr!r}: got {got!r}, want {expected!r}")
    return bad


# chunk queries cost compile latency, not CPU: thread-pool them (set
# SPARK_GRAFT_SERIAL_SUITES=1 for per-chunk tests when debugging)
if os.environ.get("SPARK_GRAFT_SERIAL_SUITES") == "1":

    @pytest.mark.parametrize(
        "chunk",
        _CHUNKS,
        ids=[f"{i * CHUNK}-{c[0][0][:25]}" for i, c in enumerate(_CHUNKS)],
    )
    def test_golden_expr(empty_graph, chunk):
        bad = _run_chunk(empty_graph, chunk)
        assert not bad, "\n".join(bad)

else:

    def test_golden_expr_pooled(empty_graph):
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            bads = list(ex.map(lambda c: _run_chunk(empty_graph, c), _CHUNKS))
        bad = [b for bs in bads for b in bs]
        assert not bad, f"{len(bad)} mismatches:\n" + "\n".join(bad[:40])


def test_case_count():
    assert len(CASES) >= 400, len(CASES)


def test_numeric_cast_golden(empty_graph):
    """'::numeric' cast golden cases (expr.out:1758-1771)."""
    age, g = empty_graph
    for expr, want in [
        ("0::numeric", "0::numeric"),
        ("2.71::numeric", "2.71::numeric"),
        ("toNumeric('12.3')", "12.3::numeric"),
    ]:
        row = age.cypher(g, f"RETURN {expr} AS v").df.collect()[0]
        assert agtype_out(row.v) == want, expr


# ---- mixed-kind ORDER BY golden (agtype.sql orderability block:550-554 and
# the cross-type ladder, agtype_util.c:271; containers element-wise :333).
# Each case: UNWIND a heterogeneous literal list, ORDER BY the element, and
# pin the full printed sequence. NULLs sort largest.
ORDERING_CASES = [
    ("[1, 'x', true]", ['"x"', "true", "1"]),
    ("[2.5, 1, 'a', false]", ['"a"', "false", "1", "2.5"]),
    ("[null, 1, 'a']", ['"a"', "1", None]),
    ("[1.01, 1, 1.001]", ["1", "1.001", "1.01"]),
    ("[true, false]", ["false", "true"]),
    ("['b', 'aa', 'a']", ['"a"', '"aa"', '"b"']),
    ("[[1], 'a', 1]", ["[1]", '"a"', "1"]),
    ("[{a: 1}, [1], 'a']", ['{"a": 1}', "[1]", '"a"']),
    ("[[2], [10]]", ["[2]", "[10]"]),
    ("[['b'], ['a', 'c'], ['a']]", ['["a"]', '["a", "c"]', '["b"]']),
    ("[[1, 2], [1]]", ["[1]", "[1, 2]"]),
    ("[[0, 1, null], [0, 1, null, 2]]", ["[0, 1, null]", "[0, 1, null, 2]"]),
    ("[[1, 1, null, 2], [0, 1, null, 2]]", ["[0, 1, null, 2]", "[1, 1, null, 2]"]),
    ("[[1, 'string'], [1, 1]]", ['[1, "string"]', "[1, 1]"]),
    # (null ELEMENTS inside top-level arrays order nulls-first in the
    # static path — documented deviation, COVERAGE.md; the dynamic-column
    # path orders them last via kind-8 element keys)
    ("[[2, 9], [2, 10]]", ["[2, 9]", "[2, 10]"]),
    ("[{b: true}, {a: 1}]", ['{"a": 1}', '{"b": true}']),
    ("[{a: 2}, {a: 1, b: 9}, {a: 1}]", ['{"a": 1}', '{"a": 1, "b": 9}', '{"a": 2}']),
    # object KEYS compare via varstr_cmp during comparison (agtype_util.c:2191)
    # even though iteration order is jsonb (length, byte)
    ("[{aa: 1}, {b: 2}]", ['{"aa": 1}', '{"b": 2}']),
    ("[7, {a: 1}, [1], 'a', true, 7.5, null]",
     ['{"a": 1}', "[1]", '"a"', "true", "7", "7.5", None]),
    ("[2, 'b', [3], 1.5, {z: 0}, false, null, 'a']",
     ['{"z": 0}', "[3]", '"a"', '"b"', "false", "1.5", "2", None]),
    ("[3, 2.5, 2, 1.5]", ["1.5", "2", "2.5", "3"]),
    ("[9007199254740993, 9007199254740992.0]",
     ["9007199254740992.0", "9007199254740993"]),  # >2^53 int stays exact
]


def test_golden_mixed_kind_ordering(empty_graph):
    age, g = empty_graph
    bad = []
    for lst, want in ORDERING_CASES:
        got = [
            agtype_out(r.x)
            for r in age.cypher(g, f"UNWIND {lst} AS x RETURN x ORDER BY x").df.collect()
        ]
        if got != want:
            bad.append(f"{lst}: got {got}, want {want}")
    assert not bad, "\n".join(bad)


def test_ordering_case_count():
    assert len(ORDERING_CASES) >= 20, len(ORDERING_CASES)


# statement-replay batches over tiny fixtures: run under the reduced
# per-statement-overhead confs (see conftest.tiny_query_confs)
import pytest as _pytest


@_pytest.fixture(autouse=True)
def _tiny_confs(spark):
    from conftest import tiny_query_confs

    with tiny_query_confs(spark):
        yield

