package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.expressions.variant.{SchemaOfVariant, VariantGet}
import org.apache.spark.sql.types._

/** Type-dispatched reference-parity expressions, registered as SQL
  * functions by [[GraftKernels.registerSqlFunctions]].
  *
  * The reference evaluator dispatches several functions on the RUNTIME
  * type of the value (src/velostream/sql/execution/expression/
  * functions.rs): ROUND goes through f64 multiply-round-divide for
  * floats but leaves integers untouched; ARRAY_LENGTH / MAP_KEYS /
  * ARRAY_CONTAINS accept a JSON STRING and operate on the parsed value.
  * Spark resolves types statically, so the same dispatch happens once at
  * analysis: each expression here is RuntimeReplaceable and picks its
  * replacement from the resolved child type — the replacement is always
  * built-in, codegen'd operators, never an interpreted shim.
  */
object VeloExprs {

  /** ROUND — functions.rs:424. A NULL precision reads NULL for EVERY
    * input type (the reference evaluates precision before the value
    * match); floats round through f64 `(f * 10^p).round() / 10^p`
    * (NOT exact-decimal HALF_UP: the reference reads the BINARY value,
    * so ROUND(1.005, 2) = 1.0 — ×100 is 100.49999999999999 — where
    * decimal-exact engines read the shortest form and say 1.01);
    * integers pass through unchanged whatever the precision;
    * ScaledInteger (decimal) keeps its scale. Spark's Round(product, 0)
    * rounds the exact decimal expansion of the f64 product with
    * HALF_UP — identical to Rust `f64::round` on every input, because
    * the product's fraction is exactly representable. */
  case class VeloRound(child: Expression, scaleArg: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child, scaleArg)
    override lazy val replacement: Expression = {
      // a literal NULL precision must short-circuit at plan time:
      // Spark's Round demands a foldable non-null scale, so the arm
      // below would otherwise fail analysis instead of reading NULL
      val scaleIsNullLit = scaleArg.foldable && scaleArg.eval(null) == null
      if (scaleIsNullLit) Literal.create(null, child.dataType)
      else child.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          If(IsNull(scaleArg), Literal.create(null, child.dataType), child)
        case dt: DecimalType if dt.precision <= Decimal.MAX_LONG_DIGITS =>
          // the reference's ScaledInteger arm (functions.rs:452-463)
          // divides the UNSCALED i64 by 10^(scale-p) through f64,
          // rounds half away from zero, multiplies back in INTEGER
          // space, and KEEPS the declared scale (p >= scale is a
          // no-op). Neither of the former arms matched: exact-decimal
          // HALF_UP rescaled to p (reads 1.01 where the reference
          // keeps 1.010) and the full-value f64 multiply inherited the
          // double's representation error — 1.005@3 is the exact
          // integer 1005 there, and 1005/10 = 100.5 rounds UP where
          // 1.005*100 = 100.4999… rounded down; the foldable and
          // per-record arms also disagreed with each other (r16
          // review). One lowering for both now.
          val pI = Cast(scaleArg, IntegerType)
          val divD = Pow(Literal(10.0), Cast(Subtract(Literal(dt.scale), pI), DoubleType))
          val rounded = Cast(Round(
            Divide(Cast(UnscaledValue(child), DoubleType), divD), Literal(0)), LongType)
          // boundary round-up gains one digit — ROUND(9.99@(3,2), 0)
          // rebuilds unscaled 1000, which MakeDecimal at the declared
          // precision nulls out where the reference's i64 (which has no
          // precision to overflow) reads 10.00 — so the result widens
          // one digit (value parity over type parity; r16 advice).
          // outP ≤ 19 still long-backed-constructible.
          val outDt = DecimalType(dt.precision + 1, dt.scale)
          // 10^k is exact in f64 for k ≤ 18, so the Long cast is exact
          // on the rebuilt arm (the zero arm below keeps k ≥ 19 — where
          // the cast WOULD saturate — out of it); the multiply stays
          // within one digit of the original unscaled magnitude
          val rebuilt = MakeDecimal(Multiply(rounded, Cast(divD, LongType)),
            outDt.precision, outDt.scale)
          // scale - p ≥ 19 ⇒ divisor ≥ 10×10^18 > 2×|unscaled| for any
          // precision ≤ 18 value, so the quotient rounds to exactly 0
          // (the reference's 10i64.pow overflows there — soft landing)
          val zero = MakeDecimal(Literal(0L), outDt.precision, outDt.scale)
          If(IsNull(scaleArg), Literal.create(null, outDt),
            If(GreaterThanOrEqual(pI, Literal(dt.scale)), Cast(child, outDt),
              If(LessThanOrEqual(pI, Literal(dt.scale - 19)), zero, rebuilt)))
        case dt: DecimalType =>
          // precision > 18: no long-backed unscaled value exists (the
          // reference's ScaledInteger is i64-backed, so such a column
          // has no reference counterpart) — full-value f64 path, outer
          // cast restores the declared scale
          val m = Pow(Literal(10.0), Cast(scaleArg, DoubleType))
          Cast(Divide(Round(Multiply(Cast(child, DoubleType), m), Literal(0)), m), dt)
        case _ =>
          val m = Pow(Literal(10.0), Cast(scaleArg, DoubleType))
          Divide(Round(Multiply(Cast(child, DoubleType), m), Literal(0)), m)
      }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0), scaleArg = c(1))
  }

  /** ARRAY_LENGTH — functions.rs:1388. A string argument is parsed as a
    * JSON array and its length returned (streaming payloads are JSON
    * text); NULL → NULL. Spark's size() would reject the string at
    * analysis. Non-array JSON reads NULL here where the reference
    * errors — a soft landing for the same misuse. */
  case class VeloArrayLength(child: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = child.dataType match {
      case _: StringType => LengthOfJsonArray(child)
      case _ => Size(child, legacySizeOfNull = false)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** MAP_KEYS — functions.rs:1722. Maps and structs yield their keys /
    * field names; a string argument is parsed as a JSON object and its
    * keys returned. */
  case class VeloMapKeys(child: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = child.dataType match {
      case _: MapType => MapKeys(child)
      case st: StructType =>
        If(IsNull(child),
          Literal.create(null, ArrayType(StringType, containsNull = false)),
          CreateArray(st.fieldNames.toSeq.map(Literal(_))))
      case _: StringType => JsonObjectKeys(child)
      case _ => MapKeys(child) // let analysis report the type error
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** ARRAY_CONTAINS — functions.rs:1611 with values_equal:1679 semantics.
    * Element comparison is NULL-SAFE (`values_equal(Null, Null)` is
    * true, so searching NULL finds a null element) and an array that
    * lacks the value reads FALSE even when it contains nulls — Spark's
    * array_contains returns NULL for both. A string argument is parsed
    * as a JSON array; elements compare by JSON type (String("1") never
    * equals Integer(1), but Integer and Float cross-compare). */
  case class VeloArrayContains(child: Expression, value: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child, value)
    // the analyzer never visits a RuntimeReplaceable's replacement, so
    // the lambda must be PRE-BOUND: a resolved NamedLambdaVariable of
    // the array's element type, not an UnresolvedNamedLambdaVariable
    private def boundExists(arr: Expression, body: Expression => Expression): Expression = {
      val (et, cn) = arr.dataType match {
        case ArrayType(e, c) => (e, c)
        case other => (other, true)
      }
      val x = NamedLambdaVariable("velo_ac_x", et, cn)
      ArrayExists(arr, LambdaFunction(body(x), Seq(x)), false)
    }
    override lazy val replacement: Expression = child.dataType match {
      case _: StringType =>
        // parse as JSON array of variants; gate each element on its JSON
        // type so "1" (STRING) never matches 1 (BIGINT), like values_equal
        // timeZoneId must be pre-filled: the analyzer's ResolveTimeZone
        // never visits a RuntimeReplaceable's replacement either
        val parsed = JsonToStructs(ArrayType(VariantType), Map.empty[String, String], child,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        // plain Cast never resolves FROM variant — extraction goes
        // through VariantGet with the identity path, like Spark's own
        // cast-of-variant lowering (failOnError=false → NULL on
        // type mismatch, which the schema gate already excludes)
        def vget(x: Expression, dt: DataType): Expression =
          new VariantGet(x, Literal("$"), dt, false,
            Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        val basePred: Expression => Expression = value.dataType match {
          case _: StringType => x =>
            And(EqualTo(SchemaOfVariant(x), Literal("STRING")),
              EqualTo(vget(x, StringType), value))
          case _: NumericType => x =>
            // variant types non-exponent JSON decimals ('[2.5]') as
            // DECIMAL(p,s), not DOUBLE — the numeric gate must admit all
            // three or ARRAY_CONTAINS('[2.5]', 2.5) silently reads false
            val sv = SchemaOfVariant(x)
            val floatish = Or(EqualTo(sv, Literal("DOUBLE")),
              StartsWith(sv, Literal("DECIMAL")))
            // absolute-epsilon, not exact f64 equality: values_equal's
            // Float arm is |a-b| < f64::EPSILON (functions.rs:1685), so
            // ARRAY_CONTAINS('[0.30000000000000004]', 0.1+0.2) is TRUE
            // in the reference; exact EqualTo read false (r16 review)
            val dblEq = LessThan(
              Abs(Subtract(vget(x, DoubleType), Cast(value, DoubleType))),
              Literal(2.220446049250313e-16))
            value.dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                // values_equal compares Integer==Integer as exact i64;
                // only the Integer-vs-Float cross-compare goes through f64
                Or(And(EqualTo(sv, Literal("BIGINT")),
                    EqualTo(vget(x, LongType), Cast(value, LongType))),
                  And(floatish, dblEq))
              case _ =>
                And(Or(EqualTo(sv, Literal("BIGINT")), floatish), dblEq)
            }
          case _: BooleanType => x =>
            And(EqualTo(SchemaOfVariant(x), Literal("BOOLEAN")),
              EqualTo(vget(x, BooleanType), value))
          case _: NullType => x => EqualTo(SchemaOfVariant(x), Literal("VOID"))
          case _ => _ => Literal(false)
        }
        // a RUNTIME null search value (nullable column holding NULL)
        // must find a JSON null element — values_equal(Null, Null) is
        // true — but the typed arms above evaluate EqualTo(…, NULL) →
        // NULL, which ArrayExists collapses to false; only the
        // statically-typed NULL literal took the VOID arm (r16 review)
        val pred: Expression => Expression =
          if (value.dataType == NullType || !value.nullable) basePred
          else x => If(IsNull(value),
            EqualTo(SchemaOfVariant(x), Literal("VOID")), basePred(x))
        boundExists(parsed, pred)
      case _ =>
        // the native-array arm mirrors values_equal's kind dispatch too:
        // a bare EqualNullSafe(element, value) had NO type
        // reconciliation — the analyzer never coerces inside a
        // RuntimeReplaceable replacement (the VeloNullIf rule), so
        // ARRAY_CONTAINS(double_arr, 2) died with a datatype-mismatch
        // internal error where the reference cross-compares Integer and
        // Float via f64 (r16 review)
        def integralT(dt: DataType): Boolean = dt match {
          case ByteType | ShortType | IntegerType | LongType => true
          case _ => false
        }
        def floatyT(dt: DataType): Boolean = dt == FloatType || dt == DoubleType
        val et = child.dataType match {
          case ArrayType(e, _) => e
          case other => other
        }
        val vt = value.dataType
        def bothNull(x: Expression): Expression = And(IsNull(x), IsNull(value))
        // CODEGEN FAST PATH (r17: the lambda arm cost q36 ~70% at
        // sf0.1 — higher-order ArrayExists sits outside whole-stage
        // codegen). When the search value can never be null at runtime
        // and compares EXACTLY (same atomic type, no epsilon float
        // rule), the reference semantics reduce to builtins:
        // null array → NULL; found → TRUE; not found → FALSE even with
        // null elements (coalesce absorbs array_contains' null-element
        // NULL). values_equal(Null, Null)=true is unreachable with a
        // non-nullable value, and same-type exact equality is Spark's
        // own — so this arm is bit-identical to the lambda arm below.
        def exactAtomic(dt: DataType): Boolean = dt match {
          case _: StringType | BooleanType | ByteType | ShortType | IntegerType
               | LongType | DateType | TimestampType | BinaryType => true
          case _: DecimalType => true
          case _ => false // floats keep the epsilon rule — lambda arm
        }
        if (!value.nullable && et == vt && exactAtomic(et))
          If(IsNull(child), Literal.create(null, BooleanType),
            Coalesce(Seq(ArrayContains(child, value), Literal(false))))
        else {
        val pred: Expression => Expression =
          if (vt == NullType) x => IsNull(x)
          else if (integralT(et) && integralT(vt))
            x => EqualNullSafe(Cast(x, LongType), Cast(value, LongType))
          else if ((integralT(et) || floatyT(et)) && (integralT(vt) || floatyT(vt)))
            // the values_equal float arm: absolute-epsilon, Null==Null
            x => Or(bothNull(x),
              And(And(IsNotNull(x), IsNotNull(value)),
                LessThan(Abs(Subtract(Cast(x, DoubleType), Cast(value, DoubleType))),
                  Literal(2.220446049250313e-16))))
          else if (VeloNullIf.sameIgnoreNull(et, vt))
            // same kind (strings, booleans, matching complex types):
            // null-safe exact equality; the cast reconciles the
            // nullability flags EqualNullSafe insists on
            x => EqualNullSafe(x, Cast(value, et))
          else
            // kind mismatch: values_equal says false — except the
            // Null==Null pairing, which runtime nulls can still hit
            x => bothNull(x)
        boundExists(child, pred)
        }
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0), value = c(1))
  }

  /** MAP key lowering (functions.rs:1369-1379): keys must be STRINGS or
    * INTEGERS — integer keys stringify (every reference map is
    * string-keyed), any other key type is an error. The reference
    * raises it per record at run time; here the same rejection surfaces
    * once at analysis, before anything executes. */
  case class VeloMapKey(child: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child)
    private def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case _: StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt if integral(dt) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"MAP keys must be strings or integers, got ${dt.simpleString}")
      }
    override lazy val replacement: Expression = child.dataType match {
      case _: StringType => child
      case _ => Cast(child, StringType)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** The reference's value→string rendering, shared by CONCAT
    * (functions.rs:1430), JOIN (functions.rs:1027), STRING_AGG
    * (aggregation/accumulator.rs:294 field_value_to_string) and
    * SET_HEADER (functions.rs:2599): Rust `Display` formatting. For
    * floats that means the shortest round-trip decimal in POSITIONAL
    * notation with no forced fraction — "100", "101.5",
    * "1000000000000000000000" — where Spark's cast renders "100.0" and
    * "1.0E21". Strings pass through; integers, booleans and timestamps
    * already render identically through cast. */
  case class VeloStr(child: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = child.dataType match {
      case _: StringType => child
      case DoubleType | FloatType =>
        StaticInvoke(GraftKernels.getClass, StringType, "rustDouble",
          Seq(Cast(child, DoubleType)), inputTypes = Seq(DoubleType),
          propagateNull = true, returnNullable = false)
      case _ => Cast(child, StringType)
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** JOIN's delimiter — functions.rs:1011-1019: the reference REQUIRES
    * a String delimiter ("JOIN delimiter must be a string") and a NULL
    * FieldValue is not a String, so both a non-string-typed delimiter
    * and a null delimiter value are errors there — not a silent cast
    * (which rendered e.g. a double 1e21 delimiter differently from the
    * same value in a value slot) and not a swallowed-to-NULL result
    * (ConcatWs nulls the whole row on a null delimiter; r13 review).
    * The type error surfaces at plan time; the null error per value. */
  case class VeloJoinDelim(child: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(child)
    override lazy val replacement: Expression = child.dataType match {
      case _: StringType =>
        // propagateNull = false: a NULL delimiter must reach the kernel
        // and throw the reference's error, not skip the call
        StaticInvoke(GraftKernels.getClass, StringType, "joinDelim",
          Seq(child), inputTypes = Seq(StringType),
          propagateNull = false, returnNullable = false)
      case other => throw new IllegalArgumentException(
        s"JOIN delimiter must be a string, got ${other.simpleString}")
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(child = c(0))
  }

  /** NULLIF — functions.rs:1768 through values_equal:1679. values_equal
    * has arms ONLY for String / Integer / Float / Boolean (plus the
    * Integer×Float cross-compare) and Array/Struct recursion; every
    * other pairing — Timestamp==Timestamp, Date==Date, Decimal==Decimal,
    * string-vs-number — falls to `_ => false`, so NULLIF on those NEVER
    * yields NULL: the left value passes through untouched. Float
    * equality is `|a-b| < f64::EPSILON` (2.22e-16, ABSOLUTE), so
    * NULLIF(0.1+0.2, 0.3) IS NULL in the reference where decimal-exact
    * engines keep the value. Maps: values_equal recurses, but Spark
    * cannot compare MapType with `=` — lowered as passthrough (the one
    * knowingly-divergent arm, unreachable from the dialect's sources). */
  case class VeloNullIf(left: Expression, right: Expression)
      extends Expression with RuntimeReplaceable {
    override def children: Seq[Expression] = Seq(left, right)
    private def ifEq(cond: Expression): Expression =
      If(cond, Literal.create(null, left.dataType), left)
    private def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    private def floaty(dt: DataType): Boolean =
      dt == FloatType || dt == DoubleType
    // the analyzer never type-coerces inside a RuntimeReplaceable's
    // replacement, so mixed-width compares must be cast explicitly
    override lazy val replacement: Expression = (left.dataType, right.dataType) match {
      case (l, r) if integral(l) && integral(r) =>
        ifEq(EqualTo(Cast(left, LongType), Cast(right, LongType)))
      case (l, r) if (integral(l) || floaty(l)) && (integral(r) || floaty(r)) =>
        ifEq(LessThan(
          Abs(Subtract(Cast(left, DoubleType), Cast(right, DoubleType))),
          Literal(2.220446049250313e-16)))
      case (_: StringType, _: StringType) => ifEq(EqualTo(left, right))
      case (BooleanType, BooleanType) => ifEq(EqualTo(left, right))
      case (l: ArrayType, r: ArrayType) if floaty(l.elementType) && floaty(r.elementType) =>
        // values_equal recurses element-wise (functions.rs:1690-1700):
        // float ELEMENTS use the same absolute-epsilon compare as
        // top-level floats, Null==Null is true (functions.rs:1681),
        // and a length mismatch is false — so [0.1+0.2] vs [0.3] IS
        // equal (→ NULL) where exact array equality would keep it.
        // Guard on ELEMENT kind only: an exact-DataType guard silently
        // missed the common column-vs-literal pairing (containsNull
        // true vs false) and fell to the never-NULL passthrough
        // (r12 review). Built by hand as resolved lambdas:
        // RuntimeReplaceable replacements materialize after
        // lambda-variable resolution.
        val a = NamedLambdaVariable("a", l.elementType, nullable = true)
        val b = NamedLambdaVariable("b", r.elementType, nullable = true)
        val pairEq = Or(
          And(IsNull(a), IsNull(b)),
          And(And(IsNotNull(a), IsNotNull(b)),
            LessThan(Abs(Subtract(Cast(a, DoubleType), Cast(b, DoubleType))),
              Literal(2.220446049250313e-16))))
        val x = NamedLambdaVariable("x", BooleanType, nullable = false)
        val allEq = ArrayForAll(
          ZipWith(left, right, LambdaFunction(pairEq, Seq(a, b))),
          LambdaFunction(x, Seq(x)))
        // Size equality first: zip_with pads the shorter array with
        // nulls, and a padded null against a null ELEMENT would read
        // equal despite the length mismatch
        ifEq(And(EqualTo(Size(left), Size(right)), allEq))
      // nullability-blind comparison instead of ==: a nullable column
      // vs a non-null literal is the same comparison in the reference;
      // differing struct FIELD NAMES stay in the passthrough arm —
      // the reference's HashMap equality needs matching keys anyway.
      // The cast reconciles the nullability flags EqualTo insists on.
      case (l: ArrayType, r: ArrayType) if VeloNullIf.sameIgnoreNull(l, r) =>
        ifEq(EqualTo(left, Cast(right, l)))
      case (l: StructType, r: StructType) if VeloNullIf.sameIgnoreNull(l, r) =>
        ifEq(EqualTo(left, Cast(right, l)))
      case _ => left // no values_equal arm: never NULL
    }
    override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
      copy(left = c(0), right = c(1))
  }

  object VeloNullIf {
    /** Structural type equality ignoring nullability flags but keeping
      * struct field NAMES (Spark's sameType is private; its public
      * equalsStructurally ignores names, which the HashMap-keyed
      * reference semantics must not). */
    private[VeloExprs] def sameIgnoreNull(a: DataType, b: DataType): Boolean = (a, b) match {
      case (x: ArrayType, y: ArrayType) => sameIgnoreNull(x.elementType, y.elementType)
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameIgnoreNull(f.dataType, g.dataType) }
      case (x: MapType, y: MapType) =>
        sameIgnoreNull(x.keyType, y.keyType) && sameIgnoreNull(x.valueType, y.valueType)
      case (x, y) => x == y
    }
  }
}
