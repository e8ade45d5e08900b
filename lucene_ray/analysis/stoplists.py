"""Snowball-project stop word lists (public data, BSD license:
https://snowballstem.org/algorithms/ — english/french/german/spanish
stop.txt; the same lists the reference bundles as
analysis/common/.../snowball/<lang>_stop.txt and loads with
WordlistLoader.getSnowballWordSet). Data, not code: embedded verbatim so
Snowball analyzers filter the exact reference stop sets.
"""

ENGLISH_SNOWBALL_STOP = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves he
him his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing would should could ought
i'm you're he's she's it's we're they're i've you've we've they've i'd
you'd he'd she'd we'd they'd i'll you'll he'll she'll we'll they'll isn't
aren't wasn't weren't hasn't haven't hadn't doesn't don't didn't won't
wouldn't shan't shouldn't can't cannot couldn't mustn't let's that's who's
what's here's there's when's where's why's how's a an the and but if or
because as until while of at by for with about against between into
through during before after above below to from up down in out on off over
under again further then once here there when where why how all any both
each few more most other some such no nor not only own same so than too
very
""".split())  # 174 words


FRENCH_SNOWBALL_STOP = frozenset("""
au aux avec ce ces dans de des du elle en et eux il je la le leur lui ma
mais me même mes moi mon ne nos notre nous on ou par pas pour qu que qui
sa se ses sur ta te tes toi ton tu un une vos votre vous c d j l à m n s t
y étée étées étant suis es êtes sont serai seras sera serons serez seront
serais serait serions seriez seraient étais était étions étiez étaient fus
fut fûmes fûtes furent sois soit soyons soyez soient fusse fusses fussions
fussiez fussent ayant eu eue eues eus ai avons avez ont aurai aurons aurez
auront aurais aurait aurions auriez auraient avais avait aviez avaient eut
eûmes eûtes eurent aie aies ait ayons ayez aient eusse eusses eût eussions
eussiez eussent ceci cela celà cet cette ici ils les leurs quel quels
quelle quelles sans soi
""".split())  # 154 words


GERMAN_SNOWBALL_STOP = frozenset("""
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das daß derselbe derselben
denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
deinem deinen deiner deines denn derer dessen dich dir du dies diese
diesem diesen dieser dieses doch dort durch ein eine einem einen einer
eines einig einige einigem einigen einiger einiges einmal er ihn ihm es
etwas euer eure eurem euren eurer eures für gegen gewesen hab habe haben
hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
jenen jener jenes jetzt kann kein keine keinem keinen keiner keines können
könnte machen man manche manchem manchen mancher manches mein meine meinem
meinen meiner meines mit muss musste nach nicht nichts noch nun nur ob
oder ohne sehr sein seine seinem seinen seiner seines selbst sich sie
ihnen sind so solche solchem solchen solcher solches soll sollte sondern
sonst über um und uns unse unsem unsen unser unses unter viel vom von vor
während war waren warst was weg weil weiter welche welchem welchen welcher
welches wenn werde werden wie wieder will wir wird wirst wo wollen wollte
würde würden zu zum zur zwar zwischen
""".split())  # 231 words


SPANISH_SNOWBALL_STOP = frozenset("""
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre
también me hasta hay donde quien desde todo nos durante todos uno les ni
contra otros ese eso ante ellos e esto mí antes algunos qué unos yo otro
otras otra él tanto esa estos mucho quienes nada muchos cual poco ella
estar estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras
vosotros vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya
suyos suyas nuestro nuestra nuestros nuestras vuestro vuestra vuestros
vuestras esos esas estoy estás está estamos estáis están esté estés
estemos estéis estén estaré estarás estará estaremos estaréis estarán
estaría estarías estaríamos estaríais estarían estaba estabas estábamos
estabais estaban estuve estuviste estuvo estuvimos estuvisteis estuvieron
estuviera estuvieras estuviéramos estuvierais estuvieran estuviese
estuvieses estuviésemos estuvieseis estuviesen estando estado estada
estados estadas estad he has ha hemos habéis han haya hayas hayamos hayáis
hayan habré habrás habrá habremos habréis habrán habría habrías habríamos
habríais habrían había habías habíamos habíais habían hube hubiste hubo
hubimos hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran
hubiese hubieses hubiésemos hubieseis hubiesen habiendo habido habida
habidos habidas soy eres es somos sois son sea seas seamos seáis sean seré
serás será seremos seréis serán sería serías seríamos seríais serían era
eras éramos erais eran fui fuiste fue fuimos fuisteis fueron fuera fueras
fuéramos fuerais fueran fuese fueses fuésemos fueseis fuesen siendo sido
tengo tienes tiene tenemos tenéis tienen tenga tengas tengamos tengáis
tengan tendré tendrás tendrá tendremos tendréis tendrán tendría tendrías
tendríamos tendríais tendrían tenía tenías teníamos teníais tenían tuve
tuviste tuvo tuvimos tuvisteis tuvieron tuviera tuvieras tuviéramos
tuvierais tuvieran tuviese tuvieses tuviésemos tuvieseis tuviesen teniendo
tenido tenida tenidos tenidas tened
""".split())  # 308 words


ITALIAN_SNOWBALL_STOP = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in nel
nello nei negli nell negl nella nelle su sul sullo sui sugli sull sugl
sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei mie tuo
tua tuoi tue suo sua suoi sue nostro nostra nostri nostre vostro vostra
vostri vostre mi ti ci vi lo la li le gli ne il un uno una ma ed se perché
anche come dov dove che chi cui non più quale quanto quanti quanta quante
quello quelli quella quelle questo questi questa queste si tutto tutti a c
e i l o ho hai ha abbiamo avete hanno abbia abbiate abbiano avrò avrai
avrà avremo avrete avranno avrei avresti avrebbe avremmo avreste avrebbero
avevo avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute sono
sei è siamo siete sia siate siano sarò sarai sarà saremo sarete saranno
sarei saresti sarebbe saremmo sareste sarebbero ero eri era eravamo
eravate erano fui fosti fu fummo foste furono fossi fosse fossimo fossero
essendo faccio fai facciamo fanno faccia facciate facciano farò farai farà
faremo farete faranno farei faresti farebbe faremmo fareste farebbero
facevo facevi faceva facevamo facevate facevano feci facesti fece facemmo
faceste fecero facessi facesse facessimo facessero facendo sto stai sta
stiamo stanno stia stiate stiano starò starai starà staremo starete
staranno starei staresti starebbe staremmo stareste starebbero stavo stavi
stava stavamo stavate stavano stetti stesti stette stemmo steste stettero
stessi stesse stessimo stessero stando
""".split())  # 279 words

PORTUGUESE_SNOWBALL_STOP = frozenset("""
de a o que e do da em um para com não uma os no se na por mais as dos como
mas ao ele das à seu sua ou quando muito nos já eu também só pelo pela até
isso ela entre depois sem mesmo aos seus quem nas me esse eles você essa
num nem suas meu às minha numa pelos elas qual nós lhe deles essas esses
pelas este dele tu te vocês vos lhes meus minhas teu tua teus tuas nosso
nossa nossos nossas dela delas esta estes estas aquele aquela aqueles
aquelas isto aquilo estou está estamos estão estive esteve estivemos
estiveram estava estávamos estavam estivera estivéramos esteja estejamos
estejam estivesse estivéssemos estivessem estiver estivermos estiverem hei
há havemos hão houve houvemos houveram houvera houvéramos haja hajamos
hajam houvesse houvéssemos houvessem houver houvermos houverem houverei
houverá houveremos houverão houveria houveríamos houveriam sou somos são
era éramos eram fui foi fomos foram fora fôramos seja sejamos sejam fosse
fôssemos fossem for formos forem serei será seremos serão seria seríamos
seriam tenho tem temos tém tinha tínhamos tinham tive teve tivemos tiveram
tivera tivéramos tenha tenhamos tenham tivesse tivéssemos tivessem tiver
tivermos tiverem terei terá teremos terão teria teríamos teriam
""".split())  # 203 words

RUSSIAN_SNOWBALL_STOP = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же вы за
бы по только ее мне было вот от меня еще нет о из ему теперь когда даже ну
вдруг ли если уже или ни быть был него до вас нибудь опять уж вам сказал
ведь там потом себя ничего ей может они тут где есть надо ней для мы тебя
их чем была сам чтоб без будто человек чего раз тоже себе под жизнь будет
ж тогда кто этот говорил того потому этого какой совсем ним здесь этом
один почти мой тем чтобы нее кажется сейчас были куда зачем сказать всех
никогда сегодня можно при наконец два об другой хоть после над больше тот
через эти нас про всего них какая много разве сказала три эту моя впрочем
хорошо свою этой перед иногда лучше чуть том нельзя такой им более всегда
конечно всю между
""".split())  # 159 words

FINNISH_SNOWBALL_STOP = frozenset("""
olla olen olet on olemme olette ovat ole oli olisi olisit olisin olisimme
olisitte olisivat olit olin olimme olitte olivat ollut olleet en et ei
emme ette eivät minä   minun  minut  minua  minussa minusta minuun minulla
minulta minulle sinä   sinun  sinut  sinua  sinussa sinusta sinuun sinulla
sinulta sinulle hän    hänen  hänet  häntä  hänessä hänestä häneen hänellä
häneltä hänelle me     meidän meidät meitä  meissä  meistä  meihin meillä
meiltä  meille te     teidän teidät teitä  teissä  teistä  teihin teillä
teiltä  teille he     heidän heidät heitä  heissä  heistä  heihin heillä
heiltä  heille tämä   tämän         tätä   tässä   tästä   tähän  tällä
tältä   tälle   tänä   täksi tuo    tuon          tuota  tuossa  tuosta
tuohon tuolla  tuolta  tuolle  tuona  tuoksi se     sen           sitä
siinä   siitä   siihen sillä   siltä   sille   sinä   siksi nämä   näiden
näitä  näissä  näistä  näihin näillä  näiltä  näille  näinä  näiksi nuo
noiden        noita  noissa  noista  noihin noilla  noilta  noille  noina
noiksi ne     niiden        niitä  niissä  niistä  niihin niillä  niiltä
niille  niinä  niiksi kuka   kenen kenet   ketä   kenessä kenestä keneen
kenellä keneltä kenelle kenenä keneksi ketkä  keiden ketkä  keitä  keissä
keistä  keihin keillä  keiltä  keille  keinä  keiksi mikä   minkä minkä
mitä   missä   mistä   mihin  millä   miltä   mille   minä   miksi mitkä
joka   jonka         jota   jossa   josta   johon  jolla   jolta   jolle
jona   joksi jotka  joiden        joita  joissa  joista  joihin joilla
joilta  joille  joina  joiksi että ja jos koska kuin mutta niin sekä sillä
tai vaan vai vaikka kanssa mukaan noin poikki yli kun nyt itse
""".split())  # 67 words

HUNGARIAN_SNOWBALL_STOP = frozenset("""
a ahogy ahol aki akik akkor alatt által általában amely amelyek amelyekben
amelyeket amelyet amelynek ami amit amolyan amíg amikor át abban ahhoz
annak arra arról az azok azon azt azzal azért aztán azután azonban bár be
belül benne cikk cikkek cikkeket csak de e eddig egész egy egyes egyetlen
egyéb egyik egyre ekkor el elég ellen elő először előtt első én éppen
ebben ehhez emilyen ennek erre ez ezt ezek ezen ezzel ezért és fel felé
hanem hiszen hogy hogyan igen így illetve ill. ill ilyen ilyenkor ison
ismét itt jó jól jobban kell kellett keresztül keressünk ki kívül között
közül legalább lehet lehetett legyen lenne lenni lesz lett maga magát majd
majd már más másik meg még mellett mert mely melyek mi mit míg miért
milyen mikor minden mindent mindenki mindig mint mintha mivel most nagy
nagyobb nagyon ne néha nekem neki nem néhány nélkül nincs olyan ott össze
ő ők őket pedig persze rá s saját sem semmi sok sokat sokkal számára
szemben szerint szinte talán tehát teljes tovább továbbá több úgy ugyanis
új újabb újra után utána utolsó vagy vagyis valaki valami valamint való
vagyok van vannak volt voltam voltak voltunk vissza vele viszont volna
""".split())  # 199 words

SWEDISH_SNOWBALL_STOP = frozenset("""
och det att i en jag hon som han på den med var sig för så till är men ett
om hade de av icke mig du henne då sin nu har inte hans honom skulle
hennes där min man ej vid kunde något från ut när efter upp vi dem vara
vad över än dig kan sina här ha mot alla under någon eller allt mycket
sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev oss
din dessa några deras blir mina samma vilken er sådan vår blivit dess inom
mellan sådant varför varje vilka ditt vem vilket sitt sådana vart dina
vars vårt våra ert era vilkas
""".split())  # 114 words

# gl/stopwords.txt (GalicianAnalyzer.DEFAULT_STOPWORD_FILE)
GALICIAN_STOP = frozenset("""
# galican stopwords a aínda alí aquel aquela aquelas aqueles aquilo aquí
ao aos as así á ben cando che co coa comigo con connosco contigo convosco
coas cos cun cuns cunha cunhas da dalgunha dalgunhas dalgún dalgúns das de
del dela delas deles desde deste do dos dun duns dunha dunhas e el ela
elas eles en era eran esa esas ese eses esta estar estaba está están este
estes estiven estou eu é facer foi foron fun había hai iso isto la las lle
lles lo los mais me meu meus min miña miñas moi na nas neste nin no non
nos nosa nosas noso nosos nós nun nunha nuns nunhas o os ou ó ós para pero
pode pois pola polas polo polos por que se senón ser seu seus sexa sido
sobre súa súas tamén tan te ten teñen teño ter teu teus ti tido tiña tiven
túa túas un unha unhas uns vos vosa vosas voso vosos vós
""".split())  # 161 words


# ckb/stopwords.txt (SoraniAnalyzer.DEFAULT_STOPWORD_FILE)
SORANI_STOP = frozenset("""
# set of kurdish stopwords # note these have been normalized with our
scheme (e represented with U+06D5, etc) # constructed from: # * Fig 5 of
"Building A Test Collection For Sorani Kurdish" (Esmaili et al) # *
"Sorani Kurdish: A Reference Grammar with selected readings" (Thackston) #
* Corpus-based analysis of 77M word Sorani collection: wikipedia, news,
blogs, etc # and و # which کە # of ی # made/did کرد # that/which ئەوەی #
on/head سەر # two دوو # also هەروەها # from/that لەو # makes/does دەکات #
some چەند # every هەر # demonstratives # that ئەو # this ئەم # personal
pronouns # I من # we ئێمە # you تۆ # you ئێوە # he/she/it ئەو # they ئەوان
# prepositions # to/with/by بە پێ # without بەبێ # along with/while/during
بەدەم # in the opinion of بەلای # according to بەپێی # before بەرلە # in
the direction of بەرەوی # in front of/toward بەرەوە # before/in the face
of بەردەم # without بێ # except for بێجگە # for بۆ # on/in دە تێ # with
دەگەڵ # after دوای # except for/aside from جگە # in/from لە لێ # in front
of/before/because of لەبەر # between/among لەبەینی # concerning/about
لەبابەت # concerning لەبارەی # instead of لەباتی # beside لەبن # instead
of لەبرێتی # behind لەدەم # with/together with لەگەڵ # by لەلایەن # within
لەناو # between/among لەنێو # for the sake of لەپێناوی # with respect to
لەرەوی # by means of/for لەرێ # for the sake of لەرێگا # on/on top
of/according to لەسەر # under لەژێر # between/among ناو # between/among
نێوان # after پاش # before پێش # like وەک
""".split())  # 132 words


NORWEGIAN_SNOWBALL_STOP = frozenset("""
og i jeg det at en et den til er som på de med han av ikke ikkje der så
var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra du
ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her alle vil
bli ble blei blitt kunne inn når være kom noen noe ville dere deres kun ja
etter ned skulle denne for deg si sine sitt mot å meget hvorfor dette
disse uten hvordan ingen din ditt blir samme hvilken hvilke sånn inni
mellom vår hver hvem vors hvis både bare enn fordi før mange også slik
vært båe begge siden dykk dykkar dei deira deires deim di då eg ein eit
eitt elles honom hjå ho hoe henne hennar hennes hoss hossen ingi inkje
korleis korso kva kvar kvarhelst kven kvi kvifor me medan mi mine mykje no
nokon noka nokor noko nokre sia sidan so somt somme um upp vere vore verte
vort varte vart
""".split())  # 172 words


# ------------------------------------------------------------------------
# Per-language analyzer stop lists bundled OUTSIDE the snowball package
# (analysis/common/src/resources/.../{ar,bg,bn,cz,el,fa,hi,id,lv}/
# stopwords.txt — mostly the Savoy CLEF lists; embedded as DATA, same
# stance as the snowball lists above). The Arabic list is intentionally
# UN-normalized (used before ArabicNormalizationFilter); the Persian list
# is normalized (used after); the Greek list is post-GreekLowerCaseFilter
# (final sigma already folded).
ARABIC_LUCENE_STOP = frozenset("""
من ومن منها منه في وفي فيها فيه و ف ثم او أو ب بها به ا أ اى اي أي أى لا
ولا الا ألا إلا لكن ما وما كما فما عن مع اذا إذا ان أن إن انها أنها إنها
انه أنه إنه بان بأن فان فأن وان وأن وإن التى التي الذى الذي الذين الى
الي إلى إلي على عليها عليه اما أما إما ايضا أيضا كل وكل لم ولم لن ولن هى
هي هو وهى وهي وهو فهى فهي فهو انت أنت لك لها له هذه هذا تلك ذلك هناك
كانت كان يكون تكون وكانت وكان غير بعض قد نحو بين بينما منذ ضمن حيث الان
الآن خلال بعد قبل حتى عند عندما لدى جميع
""".split())  # 119 words

BULGARIAN_LUCENE_STOP = frozenset("""
а аз ако ала бе без беше би бил била били било близо бъдат бъде бяха в
вас ваш ваша вероятно вече взема ви вие винаги все всеки всички всичко
всяка във въпреки върху г ги главно го д да дали до докато докога дори
досега доста е едва един ето за зад заедно заради засега затова защо
защото и из или им има имат иска й каза как каква какво както какъв като
кога когато което които кой който колко която къде където към ли м ме
между мен ми мнозина мога могат може моля момента му н на над назад най
направи напред например нас не него нея ни ние никой нито но някои някой
няма обаче около освен особено от отгоре отново още пак по повече
повечето под поне поради после почти прави пред преди през при пък първо
с са само се сега си скоро след сме според сред срещу сте съм със също т
тази така такива такъв там твой те тези ти тн то това тогава този той
толкова точно трябва тук тъй тя тях у харесва ч че често чрез ще щом я
""".split())  # 190 words

BENGALI_LUCENE_STOP = frozenset("""
এই ও থেকে করে এ না ওই এক্ নিয়ে করা বলেন সঙ্গে যে এব তা আর কোনো বলে সেই
দিন হয় কি দু পরে সব দেওয়া মধ্যে এর সি শুরু কাজ কিছু কাছে সে তবে বা বন
আগে জ্নজন পি পর তো ছিল এখন আমরা প্রায় দুই আমাদের তাই অন্য গিয়ে প্রযন্ত
মনে নতুন মতো কেখা প্রথম আজ টি ধামার অনেক বিভিন্ন র হাজার জানা নয় অবশ্য
বেশি এস করে কে হতে বি কয়েক সহ বেশ এমন এমনি কেন কেউ নেওয়া চেষ্টা লক্ষ বলা
কারণ আছে শুধু তখন যা এসে চার ছিল যদি আবার কোটি উত্তর সামনে উপর বক্তব্য
এত প্রাথমিক উপরে আছে প্রতি কাজে যখন খুব বহু গেল পেয়্র্ চালু ই নাগাদ থাকা
পাচ যাওয়া রকম সাধারণ কমনে
""".split())  # 119 words

CZECH_LUCENE_STOP = frozenset("""
a s k o i u v z dnes cz tímto budeš budem byli jseš můj svým ta tomto
tohle tuto tyto jej zda proč máte tato kam tohoto kdo kteří mi nám tom
tomuto mít nic proto kterou byla toho protože asi ho naši napište re což
tím takže svých její svými jste aj tu tedy teto bylo kde ke pravé ji nad
nejsou či pod téma mezi přes ty pak vám ani když však neg jsem tento
článku články aby jsme před pta jejich byl ještě až bez také pouze první
vaše která nás nový tipy pokud může strana jeho své jiné zprávy nové
není vás jen podle zde už být více bude již než který by které co nebo
ten tak má při od po jsou jak další ale si se ve to jako za zpět ze do
pro je na atd atp jakmile přičemž já on ona ono oni ony my vy jí ji mě
mne jemu tomu těm těmu němu němuž jehož jíž jelikož jež jakož načež
""".split())  # 172 words

GREEK_LUCENE_STOP = frozenset("""
ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε
ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα
μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ αυτα
εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ ομωσ
ισωσ οσο οτι
""".split())  # 75 words

PERSIAN_LUCENE_STOP = frozenset("""
انان نداشته سراسر خياه ايشان وي تاكنون بيشتري دوم پس ناشي وگو يا داشتند
سپس هنگام هرگز پنج نشان امسال ديگر گروهي شدند چطور ده و دو نخستين ولي
چرا چه وسط ه كدام قابل يك رفت هفت همچنين در هزار بله بلي شايد اما شناسي
گرفته دهد داشته دانست داشتن خواهيم ميليارد وقتيكه امد خواهد جز اورده شده
بلكه خدمات شدن برخي نبود بسياري جلوگيري حق كردند نوعي بعري نكرده نظير
نبايد بوده بودن داد اورد هست جايي شود دنبال داده بايد سابق هيچ همان انجا
كمتر كجاست گردد كسي تر مردم تان دادن بودند سري جدا ندارند مگر يكديگر
دارد دهند بنابراين هنگامي سمت جا انچه خود دادند زياد دارند اثر بدون
بهترين بيشتر البته به براساس بيرون كرد بعضي گرفت توي اي ميليون او جريان
تول بر مانند برابر باشيم مدتي گويند اكنون تا تنها جديد چند بي نشده كردن
كردم گويد كرده كنيم نمي نزد روي قصد فقط بالاي ديگران اين ديروز توسط سوم
ايم دانند سوي استفاده شما كنار داريم ساخته طور امده رفته نخست بيست نزديك
طي كنيد از انها تمامي داشت يكي طريق اش چيست روب نمايد گفت چندين چيزي
تواند ام ايا با ان ايد ترين اينكه ديگري راه هايي بروز همچنان پاعين كس
حدود مختلف مقابل چيز گيرد ندارد ضد همچون سازي شان مورد باره مرسي خويش
برخوردار چون خارج شش هنوز تحت ضمن هستيم گفته فكر بسيار پيش براي روزهاي
انكه نخواهد بالا كل وقتي كي چنين كه گيري نيست است كجا كند نيز يابد بندي
حتي توانند عقب خواست كنند بين تمام همه ما باشند مثل شد اري باشد اره طبق
بعد اگر صورت غير جاي بيش ريزي اند زيرا چگونه بار لطفا مي درباره من ديده
همين گذاري برداري علت گذاشته هم فوق نه ها شوند اباد همواره هر اول خواهند
چهار نام امروز مان هاي قبل كنم سعي تازه را هستند زير جلوي عنوان بود
""".split())  # 308 words

HINDI_LUCENE_STOP = frozenset("""
अंदर अत अपना अपनी अपने अभी आदि आप इत्यादि इन इनका इन्हीं इन्हें इन्हों
इस इसका इसकी इसके इसमें इसी इसे उन उनका उनकी उनके उनको उन्हीं उन्हें
उन्हों उस उसके उसी उसे एक एवं एस ऐसे और कई कर करता करते करना करने करें
कहते कहा का काफ़ी कि कितना किन्हें किन्हों किया किर किस किसी किसे की कुछ
कुल के को कोई कौन कौनसा गया घर जब जहाँ जा जितना जिन जिन्हें जिन्हों जिस
जिसे जीधर जैसा जैसे जो तक तब तरह तिन तिन्हें तिन्हों तिस तिसे तो था थी
थे दबारा दिया दुसरा दूसरे दो द्वारा न नहीं ना निहायत नीचे ने पर पर पहले
पूरा पे फिर बनी बही बहुत बाद बाला बिलकुल भी भीतर मगर मानो मे में यदि यह
यहाँ यही या यिह ये रखें रहा रहे ऱ्वासा लिए लिये लेकिन व वर्ग वह वह वहाँ
वहीं वाले वुह वे वग़ैरह संग सकता सकते सबसे सभी साथ साबुत साभ सारा से सो
ही हुआ हुई हुए है हैं हो होता होती होते होना होने अपनि जेसे होति सभि
तिंहों इंहों दवारा इसि किंहें थि उंहों ओर जिंहें वहिं अभि बनि हि उंहिं
उंहें हें वगेरह एसे रवासा कोन निचे काफि उसि पुरा भितर हे बहि वहां कोइ
यहां जिंहों तिंहें किसि कइ यहि इंहिं जिधर इंहें अदि इतयादि हुइ कोनसा
इसकि दुसरे जहां अप किंहों उनकि भि वरग हुअ जेसा नहिं
""".split())  # 227 words

INDONESIAN_LUCENE_STOP = frozenset("""
ada adanya adalah adapun agak agaknya agar akan akankah akhirnya aku
akulah amat amatlah anda andalah antar diantaranya antara antaranya
diantara apa apaan mengapa apabila apakah apalagi apatah atau ataukah
ataupun bagai bagaikan sebagai sebagainya bagaimana bagaimanapun
sebagaimana bagaimanakah bagi bahkan bahwa bahwasanya sebaliknya banyak
sebanyak beberapa seberapa begini beginian beginikah beginilah sebegini
begitu begitukah begitulah begitupun sebegitu belum belumlah sebelum
sebelumnya sebenarnya berapa berapakah berapalah berapapun betulkah
sebetulnya biasa biasanya bila bilakah bisa bisakah sebisanya boleh
bolehkah bolehlah buat bukan bukankah bukanlah bukannya cuma percuma
dahulu dalam dan dapat dari daripada dekat demi demikian demikianlah
sedemikian dengan depan di dia dialah dini diri dirinya terdiri dong
dulu enggak enggaknya entah entahlah terhadap terhadapnya hal hampir
hanya hanyalah harus haruslah harusnya seharusnya hendak hendaklah
hendaknya hingga sehingga ia ialah ibarat ingin inginkah inginkan ini
inikah inilah itu itukah itulah jangan jangankan janganlah jika jikalau
juga justru kala kalau kalaulah kalaupun kalian kami kamilah kamu
kamulah kan kapan kapankah kapanpun dikarenakan karena karenanya ke
kecil kemudian kenapa kepada kepadanya ketika seketika khususnya kini
kinilah kiranya sekiranya kita kitalah kok lagi lagian selagi lah lain
lainnya melainkan selaku lalu melalui terlalu lama lamanya selama selama
selamanya lebih terlebih bermacam macam semacam maka makanya makin malah
malahan mampu mampukah mana manakala manalagi masih masihkah semasih
masing mau maupun semaunya memang mereka merekalah meski meskipun semula
mungkin mungkinkah nah namun nanti nantinya nyaris oleh olehnya seorang
seseorang pada padanya padahal paling sepanjang pantas sepantasnya
sepantasnyalah para pasti pastilah per pernah pula pun merupakan rupanya
serupa saat saatnya sesaat saja sajalah saling bersama sama sesama
sambil sampai sana sangat sangatlah saya sayalah se sebab sebabnya
sebuah tersebut tersebutlah sedang sedangkan sedikit sedikitnya segala
segalanya segera sesegera sejak sejenak sekali sekalian sekalipun
sesekali sekaligus sekarang sekarang sekitar sekitarnya sela selain
selalu seluruh seluruhnya semakin sementara sempat semua semuanya
sendiri sendirinya seolah seperti sepertinya sering seringnya serta
siapa siapakah siapapun disini disinilah sini sinilah sesuatu sesuatunya
suatu sesudah sesudahnya sudah sudahkah sudahlah supaya tadi tadinya tak
tanpa setelah telah tentang tentu tentulah tentunya tertentu seterusnya
tapi tetapi setiap tiap setidaknya tidak tidakkah tidaklah toh waduh wah
wahai sewaktu walau walaupun wong yaitu yakni yang
""".split())  # 357 words

LATVIAN_LUCENE_STOP = frozenset("""
aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad lejpus
līdz no otrpus pa par pār pēc pie pirms pret priekš starp šaipus uz
viņpus virs virspus zem apakšpus un bet jo ja ka lai tomēr tikko
turpretī arī kaut gan tādēļ tā ne tikvien vien kā ir te vai kamēr ar
diezin droši diemžēl nebūt ik it taču nu pat tiklab iekšpus nedz tik
nevis turpretim jeb iekam iekām iekāms kolīdz līdzko tiklīdz jebšu tālab
tāpēc nekā itin jā jau jel nē nezin tad tikai vis tak iekams vien būt
biju biji bija bijām bijāt esmu esi esam esat būšu būsi būs būsim būsiet
tikt tiku tiki tika tikām tikāt tieku tiec tiek tiekam tiekat tikšu tiks
tiksim tiksiet tapt tapi tapāt topat tapšu tapsi taps tapsim tapsiet
kļūt kļuvu kļuvi kļuva kļuvām kļuvāt kļūstu kļūsti kļūst kļūstam kļūstat
kļūšu kļūsi kļūs kļūsim kļūsiet varēt varēju varējām varēšu varēsim var
varēji varējāt varēsi varēsiet varat varēja varēs
""".split())  # 163 words



CJK_LUCENE_STOP = frozenset("""
a and are as at be but by for if in into is it no not of on or s such t
that the their then there these they this to was will with www
""".split())  # 35 words (cjk/stopwords.txt — English + www)


SERBIAN_LUCENE_STOP = frozenset("""
i ili a ali pa biti ne jesam sam jesi si je jesmo smo jeste ste jesu su
nijesam nisam nijesi nisi nije nijesmo nismo nijeste niste nijesu nisu
budem budeš bude budemo budete budu budes bih bi bismo biste biše bise
bio bili budimo budite bila bilo bile ću ćeš će ćemo ćete neću nećeš
neće nećemo nećete cu ces ce cemo cete necu neces nece necemo necete
mogu možeš može možemo možete mozes moze mozemo mozete
и или а али па бити не јесам сам јеси си је јесмо смо јесте сте јесу су
нијесам нисам нијеси ниси није нијесмо нисмо нијесте нисте нијесу нису
будем будеш буде будемо будете буду будес бих би бисмо бисте бише бисе
био били будимо будите била било биле ћу ћеш ће ћемо ћете нећу нећеш
неће нећемо нећете цу цес це цемо цете нецу нецес неце нецемо нецете
могу можеш може можемо можете мозес мозе моземо мозете
""".split())  # 156 words (sr/stopwords.txt — Latin + Cyrillic forms)
